"""Plan/orchestration layer: restore controller, checkpoints, ctl ops."""
