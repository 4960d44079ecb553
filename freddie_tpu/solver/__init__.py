"""Exact cluster-assignment solver.

Replaces the reference's Gurobi ILP (py/freddie_cluster.py:347-636) with a
deterministic exact branch-and-bound over read->isoform assignments. No
external solver, no license, bit-reproducible results.
"""

from .exact import ClusterInstance, ReadRow, SolveResult, solve_exact  # noqa: F401
