"""Wave-56: a dbt-style data-test report and 3-itemset mining.

``data_tests`` — the declarative data-test harness shape (dbt's
uniqueness / not-null / accepted-values / relationship tests), run as
ONE report over the orders table: each test contributes a
(test_name, n_violations) row, so a CI gate reads a 4-row table
instead of four ad-hoc queries.  Engine shape: uniqueness counts ride
a key exchange of map-side (key, n) partials; not-null and
accepted-values fold map-side into scalar partials; the relationship
(FK-orphan) test reuses the size-adaptive ``anti_membership``
(broadcast under the cap, partitioned above).  This is the
configurable-constraint surface of the validation north star expressed
as a query.

``basket_triples`` — 3-itemset co-occurrence (the next lattice level
above ``basket_pairs``): the 10 most frequent unordered part triples
bought in the same order.  Engine shape: one order-keyed exchange;
inside each bucket two vectorized self-merges grow pairs -> triples
under the p1 < p2 < p3 canonical order (order baskets are small, so
the per-bucket blowup is bounded by C(basket,3)); the oracle is the
cubic three-way self-join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from pynomaly_ray.functions.exchange import (
    anti_membership,
    hash_aggregate,
    topk,
)
from pynomaly_ray.pipelines.queries import ORACLE_QUERIES, _pq

_STATUSES = ("O", "F", "P")
_TRIPLE_K = 10


# ---------------------------------------------------------------------------
# data_tests
# ---------------------------------------------------------------------------


def q_data_tests(sf_dir: str):
    orders = _pq(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderstatus"]
    )

    # test 1: unique o_orderkey — violations = rows - distinct keys
    def key_partial(t: pa.Table) -> pa.Table:
        ids, cnts = np.unique(
            t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64),
            return_counts=True,
        )
        return pa.table(
            {
                "o_orderkey": pa.array(ids, pa.int64()),
                "n": pa.array(cnts.astype(np.int64), pa.int64()),
            }
        )

    dup_rows = hash_aggregate(
        orders.map_batches(key_partial, batch_format="pyarrow"),
        ["o_orderkey"],
        lambda df: (
            lambda g: pd.DataFrame(
                {"extra": [int((g["n"] - 1).clip(lower=0).sum())]}
            )
        )(df.groupby("o_orderkey", sort=False)["n"].sum().reset_index()),
    ).to_pandas()
    uniq_viol = int(dup_rows["extra"].sum()) if len(dup_rows) else 0

    # tests 2+3: not-null custkey, accepted status values — map-side folds
    def scalar_partial(t: pa.Table) -> pa.Table:
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)
        nulls = int(pd.isna(ck).sum())
        st = pd.Series(t["o_orderstatus"].to_pandas())
        bad = int((~st.isin(list(_STATUSES)) | st.isna()).sum())
        return pa.table(
            {
                "nulls": pa.array([nulls], pa.int64()),
                "bad_status": pa.array([bad], pa.int64()),
            }
        )

    sc = orders.map_batches(scalar_partial, batch_format="pyarrow").to_pandas()
    null_viol = int(sc["nulls"].sum())
    status_viol = int(sc["bad_status"].sum())

    # test 4: relationship orders.o_custkey -> customer.c_custkey
    cust = _pq(sf_dir, "customer", ["c_custkey"]).map_batches(
        lambda t: pa.table({"o_custkey": t["c_custkey"].cast(pa.int64())}),
        batch_format="pyarrow",
    )
    orphans = anti_membership(
        orders.map_batches(
            lambda t: pa.table(
                {"o_custkey": t["o_custkey"].cast(pa.int64())}
            ),
            batch_format="pyarrow",
        ),
        cust,
        on="o_custkey",
    )
    fk_viol = int(orphans.count())

    return pd.DataFrame(
        {
            "test_name": [
                "accepted_values_o_orderstatus",
                "not_null_o_custkey",
                "relationship_o_custkey",
                "unique_o_orderkey",
            ],
            "n_violations": np.array(
                [status_viol, null_viol, fk_viol, uniq_viol], dtype=np.int64
            ),
        }
    )


SQL_DATA_TESTS = f"""
SELECT 'accepted_values_o_orderstatus' AS test_name,
       CAST((SELECT COUNT(*) FROM orders
             WHERE o_orderstatus NOT IN {_STATUSES!r}
                OR o_orderstatus IS NULL) AS BIGINT) AS n_violations
UNION ALL
SELECT 'not_null_o_custkey',
       CAST((SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL)
            AS BIGINT)
UNION ALL
SELECT 'relationship_o_custkey',
       CAST((SELECT COUNT(*) FROM orders
             WHERE o_custkey IS NOT NULL
               AND o_custkey NOT IN (SELECT c_custkey FROM customer))
            AS BIGINT)
UNION ALL
SELECT 'unique_o_orderkey',
       CAST((SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders)
            AS BIGINT)
ORDER BY test_name
"""


# ---------------------------------------------------------------------------
# basket_triples
# ---------------------------------------------------------------------------


def q_basket_triples(sf_dir: str):
    ds = _pq(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def pre(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "l_orderkey": t["l_orderkey"]
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
                "l_partkey": t["l_partkey"]
                .to_numpy(zero_copy_only=False)
                .astype(np.int64),
            }
        ).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def triples(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "tk": pd.Series(dtype=np.int64),
                "cnt": pd.Series(dtype=np.int64),
            }
        )
        if df.empty:
            return empty
        d = df.drop_duplicates()
        # grow the lattice with two vectorized merges under p1 < p2 < p3
        pairs = d.merge(d, on="l_orderkey", suffixes=("_1", "_2"))
        pairs = pairs[pairs["l_partkey_1"] < pairs["l_partkey_2"]]
        if pairs.empty:
            return empty
        tri = pairs.merge(
            d.rename(columns={"l_partkey": "l_partkey_3"}), on="l_orderkey"
        )
        tri = tri[tri["l_partkey_2"] < tri["l_partkey_3"]]
        if tri.empty:
            return empty
        # packed canonical triple key (partkeys < 2^21): one int64
        # groupby/exchange key; lexicographic == (p1, p2, p3) order
        tk = (
            (tri["l_partkey_1"].to_numpy(np.int64) << np.int64(42))
            | (tri["l_partkey_2"].to_numpy(np.int64) << np.int64(21))
            | tri["l_partkey_3"].to_numpy(np.int64)
        )
        keys, cnts = np.unique(tk, return_counts=True)
        return pd.DataFrame({"tk": keys, "cnt": cnts.astype(np.int64)})

    # the order exchange's reducer expands cubically from a compact
    # pair surface — pin the fan-out to the pool width so the lattice
    # growth parallelizes instead of collapsing into one size-adaptive
    # bucket (same prescription as coactive_pairs)
    per_triple = hash_aggregate(
        ds.map_batches(pre, batch_format="pyarrow"),
        ["l_orderkey"],
        triples,
        num_partitions=32,
    )
    # triples from different order-buckets can coincide: one more tiny
    # keyed sum before the global top-k
    summed = hash_aggregate(
        per_triple,
        ["tk"],
        lambda df: df.groupby("tk", sort=False)["cnt"].sum().reset_index(),
    )
    out = topk(summed, ["cnt", "tk"], _TRIPLE_K, descending=[True, False])
    tk = out["tk"].to_numpy(np.int64)
    mask = np.int64((1 << 21) - 1)
    out = pd.DataFrame(
        {
            "p1": tk >> np.int64(42),
            "p2": (tk >> np.int64(21)) & mask,
            "p3": tk & mask,
            "cnt": out["cnt"].to_numpy(np.int64),
        }
    )
    return out[["p1", "p2", "p3", "cnt"]]


SQL_BASKET_TRIPLES = f"""
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS p1, b.l_partkey AS p2, c.l_partkey AS p3,
       CAST(COUNT(*) AS BIGINT) AS cnt
FROM d a
JOIN d b ON b.l_orderkey = a.l_orderkey AND a.l_partkey < b.l_partkey
JOIN d c ON c.l_orderkey = a.l_orderkey AND b.l_partkey < c.l_partkey
GROUP BY p1, p2, p3
ORDER BY cnt DESC, p1, p2, p3
LIMIT {_TRIPLE_K}
"""


ORACLE_QUERIES["data_tests"] = (q_data_tests, SQL_DATA_TESTS)
ORACLE_QUERIES["basket_triples"] = (q_basket_triples, SQL_BASKET_TRIPLES)
