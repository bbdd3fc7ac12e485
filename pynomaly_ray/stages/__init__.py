"""pynomaly_ray.stages"""
