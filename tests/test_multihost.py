"""Two-process jax.distributed smoke test on CPU.

Proves the multihost wiring end to end: two real processes initialize a
cluster, build the global ('data','model') mesh, shard a per-process batch
with make_array_from_process_local_data, and take one identical training
step (global grad all-reduce). This is the DCN story SURVEY §2.8 maps from
the reference's Lightning one-proc-per-GPU DDP (config/config.yaml:45).
"""

import json
import os
import subprocess
import sys

import pytest

WORKER = r'''
import os, sys
sys.path.insert(0, os.environ['REPO_ROOT'])
import jax
jax.config.update('jax_platforms', 'cpu')
jax.distributed.initialize(
    coordinator_address=os.environ['COORD'],
    num_processes=2,
    process_id=int(os.environ['PROC_ID']),
)
import numpy as np
import jax.numpy as jnp
from mr_mt3_tpu.models import MT3, MT3Config
from mr_mt3_tpu.parallel import make_mesh, param_shardings, shard_batch
from mr_mt3_tpu.train.optim import make_optimizer
from mr_mt3_tpu.train.trainer import create_train_state, make_train_step

assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4  # 2 virtual CPU devices per process

cfg = MT3Config(vocab_size=1536, d_model=32, d_kv=8, d_ff=48, num_heads=4,
                num_encoder_layers=1, num_decoder_layers=1, mel_bins=512,
                dropout_rate=0.0)
model = MT3(cfg)
variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 512)),
                       decoder_input_ids=jnp.zeros((1, 4), jnp.int32))
mesh = make_mesh()  # global: data=4, model=1
params = jax.device_put(variables['params'], param_shardings(
    variables['params'], mesh))
optimizer = make_optimizer(1e-3, use_schedule=False)
state = create_train_state(params, optimizer)
step = make_train_step(model, optimizer)

# each process contributes 2 local rows -> global batch of 4; data is
# deterministic per process so both halves are defined
rng = np.random.default_rng(100 + jax.process_index())
batch = {
    'audio': rng.normal(size=(2, 256 * 128)).astype(np.float32) * 0.1,
    'valid_frames': np.full((2,), 256, np.int32),
    'targets': np.concatenate([
        rng.integers(3, 1391, (2, 20)), np.ones((2, 1), np.int64),
        np.full((2, 43), -100, np.int64)], axis=1),
}
sharded = shard_batch(batch, mesh)
assert sharded['audio'].shape[0] == 4  # global leading dim
state, metrics = step(state, sharded, jax.random.PRNGKey(1))
loss = float(metrics['loss'])
print(f'RESULT process={jax.process_index()} loss={loss:.6f}', flush=True)
'''


def _run_two_processes(tmp_path, worker_src, coord_port, extra_env=None,
                       timeout=420):
    script = tmp_path / 'worker.py'
    script.write_text(worker_src)
    repo_root = os.path.join(os.path.dirname(__file__), '..')
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            'REPO_ROOT': os.path.abspath(repo_root),
            'COORD': f'127.0.0.1:{coord_port}',
            'PROC_ID': str(pid),
            'XLA_FLAGS': '--xla_force_host_platform_device_count=2',
            'JAX_PLATFORMS': 'cpu',
        })
        env.update(extra_env or {})
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f'process {pid} failed:\n{out}'
    results = []
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith('RESULT')]
        assert line, out
        results.append(line[0])
    return results


@pytest.mark.slow
def test_two_process_training_step(tmp_path):
    results = _run_two_processes(tmp_path, WORKER, 19871)
    losses = [float(r.split('loss=')[1]) for r in results]
    # both processes computed the same global loss (grads all-reduced)
    assert losses[0] == pytest.approx(losses[1], rel=1e-6)


EVAL_WORKER = r'''
import json, os, sys
sys.path.insert(0, os.environ['REPO_ROOT'])
import jax
jax.config.update('jax_platforms', 'cpu')
jax.distributed.initialize(
    coordinator_address=os.environ['COORD'],
    num_processes=2,
    process_id=int(os.environ['PROC_ID']),
)
import numpy as np
from jax.experimental import multihost_utils
from mr_mt3_tpu.audio import write_wav
from mr_mt3_tpu.codec import note_sequences as nsq
from mr_mt3_tpu.infer.scores import get_scores
from mr_mt3_tpu.midi import note_sequence_to_midi_file
from mr_mt3_tpu.models import MT3, MT3Config
from mr_mt3_tpu.parallel import local_mesh
from mr_mt3_tpu.utils.bench_helpers import zero_variables

assert jax.process_count() == 2

shared = os.environ['SHARED_DIR']
wav_dir = os.path.join(shared, 'wav')
gt_dir = os.path.join(shared, 'gt')
out_dir = os.path.join(shared, 'out_midis')
names = [f'guitar_acoustic_00{i}-060-100' for i in range(4)]

if jax.process_index() == 0:
    os.makedirs(wav_dir); os.makedirs(gt_dir)
    rng = np.random.default_rng(0)
    for name in names:
        audio = (rng.normal(size=16000) * 0.05).astype(np.float32)
        write_wav(os.path.join(wav_dir, f'{name}.wav'), audio, 16000)
        ns = nsq.NoteSequence()
        ns.add_note(start_time=0.05, end_time=1.0, pitch=60, velocity=100,
                    program=24, is_drum=False, instrument=0)
        ns.total_time = 1.0
        note_sequence_to_midi_file(ns, os.path.join(gt_dir, f'{name}.mid'))
# fixtures written by process 0 only; everyone waits before globbing
multihost_utils.sync_global_devices('fixtures_ready')

cfg = MT3Config(vocab_size=1536, d_model=32, d_kv=8, d_ff=48, num_heads=4,
                num_encoder_layers=1, num_decoder_layers=1, mel_bins=512,
                dropout_rate=0.0)
model = MT3(cfg)
variables = zero_variables(model)  # deterministic, identical per process

files = sorted(os.path.join(wav_dir, f'{n}.wav') for n in names)
scores = get_scores(
    model=model, variables=variables, eval_audio_dir=files,
    eval_dataset='NSynth', exp_tag_name=out_dir,
    ground_truth_midi_dir=gt_dir, verbose=False,
    batch_size=2, max_length=16, mesh=local_mesh())
produced = sorted(os.listdir(out_dir))
print('RESULT ' + json.dumps({'process': jax.process_index(),
                              'scores': scores, 'produced': produced}),
      flush=True)
'''


@pytest.mark.slow
def test_two_process_eval(tmp_path):
    """Multihost evaluation end to end: the song list shards per process
    (strided — infer/scores.py), each process decodes its songs on a mesh
    of its own local devices, process 0 scores the shared output dir, and
    the broadcast hands every process the identical dict."""
    shared = tmp_path / 'shared'
    shared.mkdir()
    results = _run_two_processes(
        tmp_path, EVAL_WORKER, 19873,
        extra_env={'SHARED_DIR': str(shared)})
    parsed = [json.loads(r.split('RESULT ', 1)[1]) for r in results]
    # every process got the identical broadcast scores dict
    assert parsed[0]['scores'] == parsed[1]['scores']
    assert 'Onset F1' in parsed[0]['scores']
    # the union of both processes' shards covers every song
    expected = sorted(f'guitar_acoustic_00{i}-060-100.mid' for i in range(4))
    assert parsed[0]['produced'] == expected
