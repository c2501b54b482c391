"""Physical-plan inspection helpers (scale/efficiency evidence)."""
