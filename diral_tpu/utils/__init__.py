"""Small host-side utilities (plotting, misc)."""
