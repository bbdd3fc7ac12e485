"""pynomaly_ray.pipelines"""
