"""CLI entry point: `python -m iamr_tpu <inputs-file> [key=value ...]`

Mirrors the reference's executable convention (main.cpp:26-156):
`./amr2d.ex inputs max_step=3 ns.v=1`.
"""

import sys

import jax


def main(argv):
    if not argv:
        print("usage: python -m iamr_tpu <inputs-file> [key=value ...]")
        return 1
    path, overrides = argv[0], argv[1:]
    # x64 follows the run dtype (ns.dtype; default f64 on CPU, f32 on TPU).
    # Enabling x64 in a process also breaks Mosaic lowering of pure-f32
    # Pallas kernels, so f32 runs must leave it off.
    from iamr_tpu.config.parmparse import ParmParse
    from iamr_tpu.ns.state import config_from_inputs, dim_hint_from_path

    cfg_probe = config_from_inputs(
        ParmParse.from_file(path, overrides),
        dim_hint=dim_hint_from_path(path),
    )
    jax.config.update("jax_enable_x64", cfg_probe.dtype == "float64")
    from iamr_tpu.ns.driver import run_from_inputs

    run_from_inputs(path, overrides, verbose=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
