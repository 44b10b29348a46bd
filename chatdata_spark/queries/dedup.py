"""Placeholder — populated by later milestones."""
