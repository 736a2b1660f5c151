"""jschon_ray.sources"""
