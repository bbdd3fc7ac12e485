"""pynomaly_ray.sources"""
