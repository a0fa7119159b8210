"""onbody_tpu — a TPU-native fast-summation (N-body) framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
`onbody` reference testbed (C++/OpenMP/Vc): one-shot N-body evaluation of
N sources on M targets via five methods of increasing sophistication —
direct O(N^2), three O(N log N) treecodes, and an O(N) dual-tree traversal
— for four physics workloads (3D gravity, 2D/3D vortex Biot-Savart, 3D
vortex + velocity gradients), each self-validated against direct summation.

Architecture (TPU-first, not a port):
  * particles are SoA pytrees (`Parts`), padded to full power-of-two blocks
  * the tree is built level-synchronously with segmented median splits
    (VAMsplit semantics, ref barneshut.hpp:595-712) — reshape+argsort,
    no recursion, no pointer chasing
  * far-field proxies (pair-merge equivalents or barycentric Lagrange
    Chebyshev grids) are computed with per-level batched einsums
  * every traversal tier reduces to ONE dense pair-list executor over
    unified "block rows" (leaf particles / node proxies), run as a Pallas
    kernel with scalar-prefetched interaction lists, or a jnp fallback
  * multi-chip scaling shards target blocks over a `jax.sharding.Mesh`
"""

from onbody_tpu.config import SolverConfig
from onbody_tpu.parts import Parts
from onbody_tpu.ops import kernels, core_funcs

__version__ = "0.1.0"
