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
    jax.config.update("jax_enable_x64", True)
    from iamr_tpu.ns.driver import run_from_inputs

    path, overrides = argv[0], argv[1:]
    run_from_inputs(path, overrides, verbose=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
