"""regenie_tpu — a TPU-native whole-genome regression (GWAS) framework.

A from-scratch reimplementation of the capabilities of rgcgithub/regenie
(reference: /root/reference, v4.1) designed for TPU hardware:

- Step 1: stacked block ridge regression (level-0 per-block ridge,
  level-1 cross-validated stacking) as batched MXU matmuls + batched
  eigendecompositions over an HBM-resident genotype block stream.
- Step 2: massively-parallel association score tests (linear / logistic /
  Poisson / Cox, Firth, SPA) vectorized across the SNP axis of each
  genotype block, with gene-based burden/SKAT/ACAT tests on top.

Parallelism: jax.sharding.Mesh + shard_map; sample-axis sharding for
Step-1 Gram partial sums (psum over ICI), variant-axis sharding for
Step-2 test streams. The reference's file-based split-L0 protocol
(Data.cpp:244-309) is replaced by device collectives.
"""

__version__ = "0.1.0"
