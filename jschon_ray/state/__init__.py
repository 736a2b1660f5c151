"""jschon_ray.state"""
