"""pynomaly_ray.functions"""
