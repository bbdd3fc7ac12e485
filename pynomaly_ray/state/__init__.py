"""pynomaly_ray.state"""
