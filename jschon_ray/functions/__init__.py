"""jschon_ray.functions"""
