"""Placeholder — filled in during this round."""
