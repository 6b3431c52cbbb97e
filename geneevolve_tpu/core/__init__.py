"""Segment-ledger simulation engine (the default engine).

Per-generation cost is O(n·npheno), independent of locus count, matching the
reference's interval trick (`/root/reference/src/Population.h:20-51`) — but
every operation is a fixed-shape vectorized JAX program: meiosis is a sorted
merge of boundary arrays, CV genotyping is a searchsorted gather, phenotype
construction is (n, ncv) matmuls.
"""
