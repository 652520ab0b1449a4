"""Real 2-process multi-host coverage (VERDICT r1 item 8): loader sharding,
core.mesh.process_shard, and the evaluator's cross-host histogram
allgather (eval/evaluator.py evaluate()) run under an actual
jax.distributed CPU cluster of two local processes — the path the reference
left untested (its one collective, dist.reduce at evaluate.py:230-235)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

port, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()

# ---- core.mesh.process_shard: slices partition the global range ---------
from cabinet_tpu.core.mesh import process_shard
sl = process_shard(11)

# ---- loader sharding: each host reads its own slice ----------------------
from cabinet_tpu.data.loader import DataLoader

class Tagged:
    def __len__(self):
        return 10
    def __getitem__(self, i):
        img = np.full((4, 4, 3), i, np.float32)
        lbl = np.full((4, 4), i % 3, np.int64)
        return img, lbl

dl = DataLoader(Tagged(), batch_size=2, num_workers=0,
                shard=(jax.process_index(), jax.process_count()))
seen = []
for images, labels in dl:
    seen.extend(int(v) for v in images[:, 0, 0, 0])

# ---- evaluator cross-host reduction: full-dataset hist on every host -----
import jax.numpy as jnp
from cabinet_tpu.eval.evaluator import MscEval

def constant_apply(variables, images, train=False):
    B, H, W, _ = images.shape
    logits = jnp.zeros((B, H, W, 3)).at[..., 1].set(5.0)
    return logits, logits

dl2 = DataLoader(Tagged(), batch_size=2, num_workers=0,
                 shard=(jax.process_index(), jax.process_count()))
ev = MscEval(constant_apply, n_classes=3, scales=(1.0,), cropsize=4)
res = ev.evaluate({}, dl2)
# every pixel predicted class 1; global dataset = 10 images x 16 px
hist_total = int(np.asarray(res["confusion_matrix"]).sum())

import json
print("RESULT " + json.dumps({
    "pid": pid, "shard": [sl.start, sl.stop], "seen": seen,
    "hist_total": hist_total,
    "row1": float(np.asarray(res["confusion_matrix"])[1].sum() /
                  max(hist_total, 1)),
}))
"""


@pytest.mark.skipif(sys.platform != "linux", reason="local cluster test")
def test_two_process_cluster(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = {**os.environ, "JAX_PLATFORMS": "cpu",
           "PYTHONPATH": os.getcwd()}
    env.pop("XLA_FLAGS", None)

    procs = [subprocess.Popen([sys.executable, str(script), str(port), str(i)],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              env=env, text=True)
             for i in range(2)]
    outs = [p.communicate(timeout=240)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]

    import json

    results = []
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert line, out[-2000:]
        results.append(json.loads(line[0][len("RESULT "):]))

    # process_shard slices partition [0, 11): contiguous, disjoint, complete
    spans = sorted(tuple(r["shard"]) for r in results)
    assert spans[0][0] == 0 and spans[-1][1] == 11
    assert spans[0][1] == spans[1][0]

    # loader shards are disjoint and jointly cover the dataset
    seen0, seen1 = (set(r["seen"]) for r in results)
    assert seen0.isdisjoint(seen1)
    assert seen0 | seen1 == set(range(10))

    # every host reduced to the same GLOBAL histogram (10 imgs x 16 px)
    for r in results:
        assert r["hist_total"] == 160
        assert r["row1"] == 1.0  # constant model predicts class 1 everywhere
