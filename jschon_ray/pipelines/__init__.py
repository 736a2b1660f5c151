"""jschon_ray.pipelines"""
