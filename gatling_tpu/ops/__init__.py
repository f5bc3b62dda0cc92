"""Device compute primitives: RNG, geometry codecs, intersection, BVH."""
