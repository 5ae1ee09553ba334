"""Multihost launcher: jax.distributed in front of any driver CLI.

The reference scales by launching many single-GPU processes
(/root/reference/README.md:128-135); the TPU-native scale-out runs ONE
driver as a cooperating process group over all chips of a slice
(SURVEY.md §2.5/§5.8): every process executes the same jitted program,
the batch is sharded over the global ``dp`` mesh, and GSPMD inserts the
ICI collectives.  ``jax.distributed.initialize`` must run before any
backend-touching import, which is why this is a separate entry point
instead of a flag on the drivers themselves.

Usage (per host/process)::

    python -m takzero_tpu.drivers.multihost \
        [--coordinator HOST:PORT --num-processes N --process-id I] \
        learn -- --directory /shared/run --net net6_simhash ...

On Cloud TPU slices the three topology flags are auto-detected from the
TPU environment and can be omitted.  The wrapped driver sees
``jax.process_count() > 1`` and switches on coordinator-gated writes and
broadcast reads (drivers/learn.py, drivers/selfplay.py).
"""

from __future__ import annotations

import argparse
import importlib

DRIVERS = ("learn", "selfplay", "reanalyze")


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--coordinator", default=None,
                        help="coordinator address HOST:PORT (omit on TPU "
                        "slices: auto-detected)")
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    parser.add_argument("driver", choices=DRIVERS)
    parser.add_argument("rest", nargs=argparse.REMAINDER,
                        help="driver arguments (prefix with --)")
    args = parser.parse_args(argv)

    # Only jax itself may be imported before initialize (the driver
    # modules build device constant tables at import).
    from ..parallel import multihost

    multihost.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )

    mod = importlib.import_module(f".{args.driver}", __package__)
    rest = args.rest[1:] if args.rest[:1] == ["--"] else args.rest
    mod.main(rest)


if __name__ == "__main__":
    main()
