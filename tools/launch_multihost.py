"""Multi-host launch helper.

The reference is single-process (`nn.DataParallel` only — SURVEY.md §2.3);
the TPU-native scale-out story is `jax.distributed.initialize` + the SAME
train program over a global mesh, with gradient all-reduce riding ICI inside
a slice and DCN across slices.

Two modes:

1. **Real pods** — run on every host (the usual TPU pod manager does this):

       python train.py --model cycle_gan ... \
           --coordinator_address <host0>:1234 \
           --num_processes <N> --process_index <i>

   On Cloud TPU the three flags can be omitted entirely and
   ``jax.distributed.initialize()`` auto-discovers them; pass them only for
   manual clusters.

2. **Local demo / CI** (this script): spawn N local processes, each forced
   to the CPU platform with ``local_devices`` virtual devices, all joined
   into one 2×-process mesh over a localhost coordinator:

       python -m tools.launch_multihost --nprocs 2 --local_devices 2 \
           -- python child_script.py ...

   Each child gets COORDINATOR/NUM_PROCESSES/PROCESS_INDEX/LOCAL_DEVICES in
   its environment. tests/test_multihost.py uses this path to validate the
   multi-process data-parallel train step without a cluster.
"""

from __future__ import annotations

import argparse
import os
import socket
import subprocess
import sys
from typing import List, Optional, Sequence


def free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def launch_local(cmd: Sequence[str], nprocs: int = 2, local_devices: int = 2,
                 extra_env: Optional[dict] = None, timeout: int = 600):
    """Spawn ``nprocs`` copies of ``cmd`` wired to one localhost coordinator.

    Returns the list of completed processes (raises on any non-zero exit).
    """
    coord = f"127.0.0.1:{free_port()}"
    procs: List[subprocess.Popen] = []
    for i in range(nprocs):
        env = dict(os.environ)
        env.update(extra_env or {})
        # replace (not merely append) any inherited device-count flag — the
        # test runner's own 8-device setting would otherwise leak in
        flags = [f for f in env.get("XLA_FLAGS", "").split()
                 if not f.startswith("--xla_force_host_platform_device_count")]
        flags.append(
            f"--xla_force_host_platform_device_count={local_devices}")
        env["XLA_FLAGS"] = " ".join(flags)
        env.update(COORDINATOR=coord, NUM_PROCESSES=str(nprocs),
                   PROCESS_INDEX=str(i), LOCAL_DEVICES=str(local_devices))
        procs.append(subprocess.Popen(
            list(cmd), env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    results = []
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=timeout)
        results.append((p.returncode, out))
    for i, (rc, out) in enumerate(results):
        if rc != 0:
            raise RuntimeError(
                f"process {i} exited {rc}:\n{out[-4000:]}")
    return results


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--nprocs", type=int, default=2)
    ap.add_argument("--local_devices", type=int, default=2)
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="command to launch (prefix with --)")
    args = ap.parse_args(argv)
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        ap.error("no command given")
    for i, (rc, out) in enumerate(
            launch_local(cmd, args.nprocs, args.local_devices)):
        print(f"--- process {i} (rc={rc}) ---\n{out}")


if __name__ == "__main__":
    main()
