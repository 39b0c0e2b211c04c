"""Conjugate-gradient solvers and preconditioners."""
