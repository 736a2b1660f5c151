"""jschon_ray.vspec"""
