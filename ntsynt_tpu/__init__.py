"""ntsynt_tpu — a TPU-native multi-genome synteny engine.

A from-scratch reimplementation of the capabilities of bcgsc/ntSynt
(minimizer sketching -> common-kmer Bloom filter -> minimizer graph ->
linear synteny paths -> multi-round coordinate refinement -> collinear
merging), redesigned for TPU hardware:

- ntHash-style rolling hash + windowed-minimizer sketching runs as a
  vectorized JAX/Pallas computation over genome tiles (64-bit hashes as
  uint32 pairs, since TPUs have no native 64-bit integer lanes).
- Bloom filters are bit-packed uint32 arrays in HBM with sorted
  scatter-OR inserts and gather probes.
- The minimizer graph / block machinery operates on flat NumPy/JAX
  arrays rather than igraph objects.
- Multi-chip scaling shards genome tiles over a jax.sharding.Mesh and
  combines Bloom-filter bit arrays with a butterfly all-reduce(OR).

The pipeline is one in-memory Python process (no snakemake, no
subprocess round-trips through TSV files), with optional emission of
ntSynt-compatible artifacts (.fai, minimizer TSVs, synteny-block TSVs).

Reference layout surveyed in /root/repo/SURVEY.md.
"""

__version__ = "0.1.0"

from .utils.malloc_tune import tune_glibc_malloc as _tune

_tune()  # see utils/malloc_tune.py: first-touch fault churn dominates
# large-array host stages on fault-throttled VMs without this

from . import ops, io, graph, core, parallel, utils  # noqa: F401
