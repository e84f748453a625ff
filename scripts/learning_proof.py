"""End-to-end learning proof: train the full-size model on synthetic stems,
then measure eval SDR before/after through the benchmark harness.

    python scripts/learning_proof.py [--steps 300] [--save artifacts/trained_head.npz]

Recorded run on the real TPU v5e (2026-08-17, random-init towers with the
torch-parity init bounds, held-out test track): eval SDR -4.37 -> +6.10 dB
(**+10.47 dB**) after 240 train steps at ~0.86 steps/s wall (incl. host
data loading on the 1-core host). Previous run (pre-parity init,
2026-08-16): +9.45 dB.

``--save`` writes the trained ~3 M-param head as a params .npz — the
committed demo-default head (``atht._default_head_path``) is produced this
way; the towers stay the deterministic PRNGKey(0) random init, so the
artifact reproduces on any host.
"""
import argparse
import sys, time
import pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import jax, jax.numpy as jnp, numpy as np
from audio_to_sheet_music_tpu.data import synthetic_tracks, StemSegmentDataset, BatchLoader
from audio_to_sheet_music_tpu.eval import evaluate_model, aggregate_results
from audio_to_sheet_music_tpu.eval.models import OursModel
from audio_to_sheet_music_tpu.models import atht
from audio_to_sheet_music_tpu.text.tokenizer import HashTokenizer
from audio_to_sheet_music_tpu.train import TrainState, make_optimizer, make_train_step

ap = argparse.ArgumentParser()
ap.add_argument('--steps', type=int, default=300)
ap.add_argument('--save', default=None,
                help='write the trained head params .npz here')
ap.add_argument('--batch', type=int, default=8)
ap.add_argument('--segment-seconds', type=float, default=6.0,
                help='train segment length; shorter makes a 1-core CPU '
                     'fallback run feasible when the TPU tunnel is down')
args = ap.parse_args()

tracks = synthetic_tracks(4, seconds=24.0, cache_dir='/tmp/atsm_learn_proof/train')
test_tracks = synthetic_tracks(1, seconds=12.0, cache_dir='/tmp/atsm_learn_proof/test', seed=99)

params = atht.init(jax.random.PRNGKey(0))

def eval_sdr(p, label):
    model = OursModel(p, segment_seconds=6.0, overlap_seconds=1.5)
    res = evaluate_model(model.separate_all, test_tracks, label, verbose=False)
    agg = aggregate_results(res)
    print(f"{label}: SDR avg {agg['sdr']['average']:.2f} "
          f"(drums {agg['sdr']['drums']:.2f} bass {agg['sdr']['bass']:.2f} "
          f"other {agg['sdr']['other']:.2f} vocals {agg['sdr']['vocals']:.2f})")
    return agg['sdr']['average']

before = eval_sdr(params, 'random-init')

seg_samples = int(round(args.segment_seconds * 44100))
ds = StemSegmentDataset(tracks, seg_samples, random_segments=True, augment=True)
loader = BatchLoader(ds, args.batch, HashTokenizer())
opt = make_optimizer(lr=3e-4, total_steps=args.steps)
state = TrainState.create(params['head'], opt)
frozen = {'htdemucs': params['htdemucs'], 'clap': params['clap']}
step = make_train_step(opt)

t0 = time.time(); n = 0
for epoch in range(30):
    for raw in loader:
        batch = {k: jnp.asarray(v) for k, v in raw.items() if k != 'stem_index'}
        state, metrics = step(state, frozen, batch)
        n += 1
        if n % 50 == 0:
            print(f"step {n}: loss {float(metrics['loss/total']):.3f} "
                  f"({n/(time.time()-t0):.2f} steps/s)")
        if n >= args.steps:
            break
    if n >= args.steps:
        break

trained = dict(params); trained['head'] = state.head
after = eval_sdr(trained, f'after-{n}-steps')
print(f"SDR improvement: {after - before:+.2f} dB")

if args.save:
    from audio_to_sheet_music_tpu.train.checkpoint import save_params_npz
    out = pathlib.Path(args.save)
    out.parent.mkdir(parents=True, exist_ok=True)
    save_params_npz(out, jax.tree.map(np.asarray, state.head))
    print(f"saved trained head -> {out} "
          f"({out.stat().st_size / 1e6:.1f} MB, {n} steps)")
