"""I/O: PLY point clouds / model exports, checkpoints."""
