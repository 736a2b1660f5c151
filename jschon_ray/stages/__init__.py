"""jschon_ray.stages"""
