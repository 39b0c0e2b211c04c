"""Mesh generation, DoF numbering and layout optimization."""
