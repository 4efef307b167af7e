"""Pure JAX array kernels — the reference's ``<verb>_zyx`` layer, TPU-first.

Every kernel is a pure function of arrays and static parameters, jittable and
vmappable over (T, C) batches. No I/O, no host control flow on traced values.
"""
