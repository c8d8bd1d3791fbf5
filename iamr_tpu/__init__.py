"""iamr_tpu — a TPU-native adaptive-mesh incompressible Navier-Stokes framework.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of
AMReX-Fluids/IAMR (variable-density projection-method solver): Godunov
advection, Crank-Nicolson diffusion, MAC + nodal approximate projections with
a geometric-multigrid engine, multilevel AMR with refluxing and sync
projection, embedded boundaries, tracer particles, and IAMR-compatible
inputs files / plotfiles.

Design (not a port):
  * Each AMR level is a dense global array per centering, sharded over a
    ``jax.sharding.Mesh``; ghost exchange is XLA halo collectives, not MPI.
  * The timestep is a single jit-compiled functional program; regrids
    recompile out-of-band.
  * Multigrid smoothers/stencils use fused XLA ops with Pallas kernels for
    the hot paths.
"""

__version__ = "0.1.0"

from iamr_tpu.config.parmparse import ParmParse
