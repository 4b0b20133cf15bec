"""Gate probe: one tiny matmul on the real chip.

Exits 0 when the TPU answers, 1 on timeout/failure — the measurement
agenda (perf/tpu_agenda.sh) gates on it so a wedged relay doesn't burn
the bench watchdog budgets.  In-process alarm only (CLAUDE.md rule 1:
never hard-kill a client mid-TPU-operation).
"""

import os
import signal
import sys
import time


def main():
    budget = int(os.environ.get("PERF_TIMEOUT_S", "900"))
    signal.signal(signal.SIGALRM,
                  lambda *a: (_ for _ in ()).throw(TimeoutError()))
    signal.alarm(budget)
    try:
        import jax
        import jax.numpy as jnp
        t0 = time.time()
        n = len(jax.devices())
        x = jnp.ones((256, 256), jnp.float32)
        y = (x @ x).block_until_ready()
        del y
        print(f"tpu ok: {n} device(s), round-trip "
              f"{time.time() - t0:.1f}s", flush=True)
        return 0
    except TimeoutError:
        print(f"tpu gate: no response in {budget}s", flush=True)
        return 1


if __name__ == "__main__":
    sys.exit(main())
