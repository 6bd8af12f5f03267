"""Device-mesh sharded training/rendering."""
