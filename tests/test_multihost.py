"""Multi-process jax.distributed test (SURVEY.md §5.h DCN story).

Real multi-HOST hardware is unavailable here, but jax.distributed runs
single-node multi-PROCESS on CPU (Gloo collectives over localhost), which
exercises the identical code path: initialize -> global mesh spanning both
processes' devices -> file scatter -> one sharded_spec_pipeline step with
its halo ppermute and pmax/pmin dB all-reduce -> per-process verification
of the addressable shards against a single-device reference.
"""

import os
import socket
import subprocess
import sys

import pytest

_RUNNER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); port = sys.argv[2]
sys.path.insert(0, sys.argv[3])
from msv_tpu.parallel.multihost import (
    assign_tracks_by_host, initialize_distributed, make_global_mesh)
initialize_distributed(f"127.0.0.1:{port}", num_processes=2, process_id=pid)
import numpy as np
import jax.numpy as jnp
from msv_tpu.config import SpecSetting, derive_stft_params
from msv_tpu.ops.windows import default_stft_window
from msv_tpu.ops.dft import windowed_dft_matrices
from msv_tpu.ops.mel import calc_mel_fb_default
from msv_tpu.ops.framing import n_frames_for, reflect_pad_center
from msv_tpu.ops.stft import perform_stft
from msv_tpu.ops.decibel import amp_to_db
from msv_tpu.parallel.sharded import sharded_spec_pipeline

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4
mesh = make_global_mesh(2, 4)
# deterministic round-robin scatter: both processes agree, no overlap
mine = assign_tracks_by_host(["a", "b", "c"])
assert mine == (["a", "c"] if pid == 0 else ["b"]), mine

p = derive_stft_params(16000, SpecSetting())
window = default_stft_window(p.win_length, p.n_fft)
c, s = windowed_dft_matrices(window, p.n_fft)
mel_fb = calc_mel_fb_default(16000, p.n_fft)
rng = np.random.default_rng(7)
B, L = 2, 16000
wavs = rng.standard_normal((B, L)).astype(np.float32) * 0.3
n_frames = n_frames_for(L, p.win_length, p.hop_length)
padded = np.stack([reflect_pad_center(w, p.win_length) for w in wavs])
need = (n_frames + 4) * p.hop_length + p.win_length
if padded.shape[1] < need:
    padded = np.pad(padded, ((0, 0), (0, need - padded.shape[1])))
db, gmin, gmax, n_total = sharded_spec_pipeline(
    mesh, padded, p.win_length, p.hop_length, c, s, mel_fb, n_frames)

# single-device reference computed independently in THIS process
refs, emin, emax = [], np.inf, -np.inf
for b in range(B):
    spec = np.abs(np.asarray(
        perform_stft(wavs[b], p.win_length, p.hop_length, p.n_fft)))
    ref = np.asarray(amp_to_db(jnp.asarray(spec @ mel_fb)))
    refs.append(ref); emin = min(emin, ref.min()); emax = max(emax, ref.max())
assert abs(float(gmax) - emax) < 1e-3, (float(gmax), emax)
assert abs(float(gmin) - emin) < 2.5e-3, (float(gmin), emin)

nchecked = 0
for sh in db.addressable_shards:
    bsel = range(B)[sh.index[0]]
    fsel = range(n_total)[sh.index[1]]
    local = np.asarray(sh.data)
    for bi, bglob in enumerate(bsel):
        for fi, fglob in enumerate(fsel):
            if fglob >= n_frames:
                continue
            d = np.abs(local[bi, fi].astype(np.float64)
                       - refs[bglob][fglob].astype(np.float64))
            assert d.max() < 2.5e-3, (bglob, fglob, float(d.max()))
            nchecked += 1
assert nchecked > 0
print(f"MULTIHOST_OK pid={pid} checked={nchecked}", flush=True)
"""


def test_two_process_distributed_pipeline(tmp_path):
    # bounded by the communicate(timeout=240) below (pytest-timeout is not
    # in this image)
    runner = tmp_path / "runner.py"
    runner.write_text(_RUNNER)
    with socket.socket() as s:  # free localhost port for the coordinator
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(runner), str(pid), port, repo],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for pr in procs:
        try:
            out, _ = pr.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (pr, out) in enumerate(zip(procs, outs)):
        assert pr.returncode == 0, f"process {pid} failed:\n{out[-3000:]}"
        assert f"MULTIHOST_OK pid={pid}" in out, out[-3000:]
