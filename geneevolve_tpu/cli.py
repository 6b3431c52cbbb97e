"""Drop-in CLI: accepts the reference GeneEvolve flag set
(`/root/reference/src/Main.cpp:124-199`) so the Examples.zip scenario scripts
run unmodified against this engine.

    python -m geneevolve_tpu --file_gen_info ... --file_hap_name ... [flags]
"""

from __future__ import annotations

import sys
import time

from geneevolve_tpu.config import ConfigError, parse_args, print_config

_HELP = """geneevolve-tpu — TPU-native forward-time whole-genome simulator

Required (per population; separate populations with --next_population):
  --file_gen_info <file>      generation schedule (6 columns)
  --file_hap_name <file> | --file_ref_vcf <file>
  --file_recom_map <file>
  --file_cv_info <file>       (repeatable, one per phenotype)
  --file_cvs <file>           (repeatable, one per phenotype)

Optional per phenotype (repeatable): --va --vd --vc --ve --vf --omega --beta --lambda
Optional per population: --file_mutation_map --MM <p> --RM
Global: --gamma (per phenotype) --file_migration --avoid_inbreeding
        --vt_type {1,2} --seed <n> --prefix <s> --debug
        --profile <dir>  (write a jax.profiler trace of the main loop)
        --mesh auto|ind=N[,loci=M]  (shard the run over a device mesh;
        outputs are bit-identical to the single-device run)
Output: --out_hap --out_plink --out_plink01 --out_vcf --out_interval
        --file_output_generations <file> --no_output
Checkpointing: --checkpoint_every <n> --resume <prefix>.ckpt.npz
"""


def _enable_compilation_cache() -> None:
    """Persist XLA compilations across runs (~20 s of warmup on the Example
    scenarios is compile time; a warm cache brings total wall time to the
    reference binary's). Opt out with GE_NO_COMPILE_CACHE=1."""
    import os

    if os.environ.get("GE_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        cache = os.environ.get(
            "GE_COMPILE_CACHE",
            os.path.join(
                os.path.expanduser("~"), ".cache", "geneevolve_tpu", "xla"
            ),
        )
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # cache is an optimization, never a requirement


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv or any(a in ("--help", "-h", "?") for a in argv):
        print(_HELP)
        return 0
    t0 = time.time()
    try:
        cfg = parse_args(argv)
    except ConfigError as e:
        print(f"Error: {e}", file=sys.stderr)
        return 1
    print_config(cfg)
    _enable_compilation_cache()
    from geneevolve_tpu.parallel.multihost import maybe_init_distributed

    maybe_init_distributed()  # no-op unless a coordinator is configured
    if cfg.backend == "dense":
        from geneevolve_tpu.dense.backend import DenseSimulation as Sim
    else:
        from geneevolve_tpu.core.engine import Simulation as Sim  # defer jax init

    mesh = None
    if cfg.mesh:
        from geneevolve_tpu.config import build_mesh

        mesh = build_mesh(cfg.mesh)
        print(
            f" Device mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}"
            f" on {mesh.devices.size} x {mesh.devices.flat[0].platform}"
        )
    sim = Sim(cfg, mesh=mesh)
    sim.run()
    print(f" Total time: {time.time() - t0:.1f} s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
