"""geneevolve-tpu: a TPU-native forward-in-time whole-genome simulator.

Capabilities mirror GeneEvolve (Tahmasbi & Keller, Bioinformatics 2017;
reference C++ at /root/reference) re-designed for JAX/XLA/Pallas: vectorized
segment-ledger evolution, dense sharded meiosis kernels, and a
2-D (individuals x loci) device mesh.
"""

__version__ = "0.1.0"

from geneevolve_tpu.config import ScenarioConfig, PopulationConfig, PhenotypeConfig

__all__ = [
    "ScenarioConfig",
    "PopulationConfig",
    "PhenotypeConfig",
    "__version__",
]
