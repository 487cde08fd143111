"""Host-side utilities (resource metrics, misc helpers)."""
