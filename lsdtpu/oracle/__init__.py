"""Numpy oracle: exact-semantics CPU re-implementation of the reference
pipeline (LSD + RDP + FA + UKF).  Used as the golden model for every TPU
kernel test and to measure the performance baseline."""
