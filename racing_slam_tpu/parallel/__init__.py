"""Device-mesh sharding: distributed bundle adjustment and multi-sequence DP."""
