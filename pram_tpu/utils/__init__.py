"""Host-side utilities: image ops, visualization, logging."""
