"""Train orchestrator (reference `src/train.py:274-605` redesigned TPU-first).

``train(config)`` wires: config -> params (converted checkpoint or random
init) -> decode-once datasets + prefetching loaders -> AdamW/cosine/clip ->
auto-resume from ``latest`` -> jitted epoch loop with optional data-parallel
batch sharding -> validation with per-stem SDR buckets -> epoch/best/latest
checkpoints -> metric logging (wandb when configured, JSONL always).

Differences from the reference, by design:
- validation subset really comes from the *val* dataset (the reference
  indexes the train set by mistake, `src/train.py:452`),
- checkpoints are written once per epoch + best/latest (the reference saved
  twice per epoch regardless of ``save_every``, `src/train.py:579-590`),
- the text tower runs inside the same jit as the separation towers; prompts
  are tokenised in the data pipeline.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data import BatchLoader, StemSegmentDataset, discover_tracks
from ..models import atht
from ..parallel import mesh as meshlib
from ..text.prompts import STEM_NAMES
from ..text.tokenizer import default_tokenizer
from . import checkpoint as ckpt
from .step import TrainState, make_eval_step, make_optimizer, make_train_step


class MetricLogger:
    """wandb when enabled + JSONL always (reference logs via wandb only)."""

    def __init__(self, cfg: Config, out_dir: Path):
        self._wandb = None
        out_dir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(out_dir / "metrics.jsonl", "a")
        if cfg.wandb.use_wandb:
            try:
                import wandb

                self._wandb = wandb.init(project=cfg.wandb.project,
                                         name=cfg.wandb.run_name)
            except Exception as e:  # noqa: BLE001 - degrade loudly
                print(f"WARNING: use_wandb=True but wandb.init failed "
                      f"({e}); metrics go to JSONL only", flush=True)
                self._wandb = None

    def log(self, metrics: Mapping[str, float], step: int) -> None:
        rec = {k: float(v) for k, v in metrics.items()}
        rec["step"] = step
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._wandb is not None:
            self._wandb.log(rec, step=step)

    @property
    def media_active(self) -> bool:
        return self._wandb is not None

    def log_media(self, mixture, target, estimate, stem: str, step: int) -> None:
        """Separation triptych + audio clips (reference `src/train.py:113-123`)."""
        if self._wandb is None:
            return
        from ..utils import wandb_log

        wandb_log.log_separation_to_wandb(mixture, target, estimate, stem,
                                          step=step, prefix="train_media")


def _subset(dataset: StemSegmentDataset, pct: float, seed: int = 0):
    """Random percentage subset (reference `src/train.py:444-452`)."""
    if pct >= 1.0:
        return dataset
    rng = np.random.default_rng(seed)
    n = max(1, int(len(dataset.index_map) * pct))
    keep = rng.permutation(len(dataset.index_map))[:n]
    dataset.index_map = [dataset.index_map[i] for i in keep]
    return dataset


def train(cfg: Config, params=None, mesh=None,
          max_steps_per_epoch: int | None = None,
          pretrained: bool = False) -> Dict[str, float]:
    """Run training; returns ``{"best_sdr": ..., "final_epoch": ...}``.

    Pass ``pretrained=True`` when supplying converted real-checkpoint
    weights via ``params`` (``resume_from=*.pt`` sets it automatically):
    it makes the tokenizer refuse the hash fallback, which would feed
    meaningless ids to a pretrained text tower.
    """
    compute_dtype = jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16" else jnp.float32
    out_dir = Path(cfg.wandb.output_dir)
    logger = MetricLogger(cfg, out_dir)

    if params is None:
        resume = cfg.training.resume_from
        if resume and Path(resume).suffix == ".pt":
            from ..convert.torch_import import import_atht_checkpoint

            params = import_atht_checkpoint(resume, strict=False)
            pretrained = True
        else:
            params = atht.init(jax.random.PRNGKey(0))
    # Converted (pretrained) weights demand real BPE ids; random init may
    # fall back to the hash tokenizer (tests, random-weight benches).
    tokenizer = default_tokenizer(require_real=pretrained)

    train_tracks = discover_tracks(cfg.data.train_dir)
    val_tracks = discover_tracks(cfg.data.test_dir)
    if not val_tracks:
        # last-resort fallback (keeps smoke runs alive), but NEVER silent:
        # validating on train data inflates val/sdr and picks the "best"
        # checkpoint by train-set fit — the reference bug (src/train.py:452)
        # this trainer exists to fix
        print(f"WARNING: no validation tracks found under "
              f"{cfg.data.test_dir!r}; validating on TRAINING tracks — "
              "val/sdr and best-checkpoint selection are unreliable",
              flush=True)
        val_tracks = train_tracks
    seg = cfg.data.segment_samples

    def make_train_loader():
        # torch-DataLoader-style semantics: num_workers >= 1 uses the C++
        # segment loader with that many worker threads (requires every track
        # to be a decode-once npy cache and no percentage subset);
        # num_workers == 0 stays in-process Python (reference config.yaml:23
        # default — and the right choice on single-core hosts, where numpy
        # slicing already saturates the TPU step).
        from ..data.native_loader import NativeBatchLoader, native_available

        if (cfg.training.num_workers >= 1 and cfg.data.pct_train >= 1.0
                and native_available()
                and all(t.kind == "npy" for t in train_tracks)):
            return NativeBatchLoader(
                [t.path for t in train_tracks], seg, cfg.training.batch_size,
                tokenizer, n_threads=cfg.training.num_workers,
                augment=cfg.data.augment,
                random_segments=cfg.data.random_segments)
        ds = _subset(StemSegmentDataset(train_tracks, seg,
                                        random_segments=cfg.data.random_segments,
                                        augment=cfg.data.augment),
                     cfg.data.pct_train)
        return BatchLoader(ds, cfg.training.batch_size, tokenizer)

    train_loader = make_train_loader()
    val_ds = _subset(StemSegmentDataset(val_tracks, seg), cfg.data.pct_test,
                     seed=1)
    val_loader = BatchLoader(val_ds, cfg.training.batch_size, tokenizer,
                             shuffle=False)
    if len(val_loader) == 0:
        # drop_last batching: fewer val samples than batch_size -> zero val
        # batches -> val_sdr stays NaN and checkpoints/best is never
        # written.  Make that failure mode loud.
        print(f"WARNING: validation set ({len(val_ds)} samples) is smaller "
              f"than batch_size={cfg.training.batch_size}; no val batches "
              "will run and no 'best' checkpoint will be selected", flush=True)

    steps_per_epoch = min(len(train_loader), max_steps_per_epoch or 10**9)
    total_steps = max(1, steps_per_epoch * cfg.training.num_epochs)
    opt_cfg = cfg.training.optimizer
    optimizer = make_optimizer(opt_cfg.lr, opt_cfg.weight_decay,
                               opt_cfg.grad_clip, total_steps)
    loss_cfg = {
        "use_l1": cfg.training.use_L1_comb_loss,
        "sdr_weight": cfg.training.sdr_weight,
        "sisdr_weight": cfg.training.sisdr_weight,
        "l1_sdr_weight": cfg.training.l1_sdr_weight,
        "l1_weight": cfg.training.l1_weight,
    }
    train_step = make_train_step(optimizer, loss_cfg, compute_dtype)
    eval_step = make_eval_step(loss_cfg, compute_dtype)
    # jitted media forward: the wandb triptych sampler must not fall back to
    # eager per-op dispatch (costly over a TPU tunnel)
    media_forward = jax.jit(
        lambda p, mix, ids, mask: atht.forward(p, mix, ids, mask,
                                               compute_dtype))

    frozen = {"htdemucs": params["htdemucs"], "clap": params["clap"]}
    state = TrainState.create(params["head"], optimizer)
    if mesh is not None:
        frozen = meshlib.replicate(frozen, mesh)
        state = meshlib.replicate(state, mesh)

    ckpt_dir = Path(cfg.wandb.checkpoint_dir)
    start_epoch, best_sdr = 0, -np.inf
    # resume precedence (reference src/train.py:496-508): an explicit
    # training.resume_from Orbax directory wins over checkpoint_dir/latest
    # (.pt resume_from was consumed above as converted params)
    resume = cfg.training.resume_from
    latest = None
    if resume and Path(resume).suffix != ".pt":
        if not Path(resume).exists():
            raise FileNotFoundError(
                f"training.resume_from points at missing checkpoint: {resume}")
        latest = Path(resume)
    if latest is None:
        latest = ckpt.latest_checkpoint(ckpt_dir)
    if latest is not None:  # auto-resume (reference src/train.py:503-508)
        state, epoch, metrics = ckpt.load_checkpoint(latest, state)
        start_epoch = epoch + 1
        best_sdr = metrics.get("best_sdr", -np.inf)
        print(f"resumed from {latest} at epoch {start_epoch}")

    def put_batch(batch):
        arrs = {k: jnp.asarray(v) for k, v in batch.items()
                if k != "stem_index"}
        if mesh is not None:
            arrs = meshlib.shard_batch(arrs, mesh)
        return arrs, batch["stem_index"]

    global_step = int(state.step)
    mean_loss = float("nan")
    for epoch in range(start_epoch, cfg.training.num_epochs):
        t0 = time.time()
        # device-side running loss: per-step float(...) would force a
        # host round-trip per step, serialising dispatch against the TPU
        loss_sum = jnp.zeros((), jnp.float32)
        n_steps = 0
        for i, raw in enumerate(train_loader):
            if i >= steps_per_epoch:
                break
            batch, _ = put_batch(raw)
            state, metrics = train_step(state, frozen, batch)
            global_step += 1
            if global_step % cfg.wandb.log_every == 0:
                logger.log({f"train/{k}": float(v) for k, v in metrics.items()},
                           global_step)
                if logger.media_active:
                    params_now = {"htdemucs": frozen["htdemucs"],
                                  "clap": frozen["clap"], "head": state.head}
                    est = media_forward(params_now, batch["mixture"][:1],
                                        batch["input_ids"][:1],
                                        batch["attention_mask"][:1])
                    stem = STEM_NAMES[int(raw["stem_index"][0])]
                    logger.log_media(np.asarray(batch["mixture"][0]),
                                     np.asarray(batch["target"][0]),
                                     np.asarray(est[0]), stem, global_step)
            loss_sum = loss_sum + metrics["loss/total"]
            n_steps += 1
        dt = time.time() - t0
        mean_loss = float(loss_sum) / n_steps if n_steps else np.nan
        print(f"epoch {epoch}: loss {mean_loss:.4f} "
              f"({steps_per_epoch / max(dt, 1e-9):.2f} steps/s)")

        val_sdr = np.nan
        if (epoch + 1) % cfg.wandb.validate_every == 0:
            params_now = {"htdemucs": frozen["htdemucs"],
                          "clap": frozen["clap"], "head": state.head}
            per_stem = {s: [] for s in STEM_NAMES}
            agg = []
            for raw in val_loader:
                batch, stem_idx = put_batch(raw)
                metrics, per_item = eval_step(params_now, batch)
                per_item = np.asarray(per_item)
                agg.append(per_item.mean())
                for j, si in enumerate(stem_idx):
                    per_stem[STEM_NAMES[int(si)]].append(float(per_item[j]))
            if agg:
                val_sdr = float(np.mean(agg))
                log = {"val/sdr": val_sdr}
                log.update({f"val/sdr_{s}": float(np.mean(v))
                            for s, v in per_stem.items() if v})
                logger.log(log, global_step)
                print(f"  val SDR {val_sdr:.2f} dB")

        is_best = np.isfinite(val_sdr) and val_sdr > best_sdr
        if is_best:
            best_sdr = val_sdr
        ckpt.save_checkpoint(ckpt_dir, state, epoch,
                             {"loss": mean_loss, "val_sdr": val_sdr,
                              "best_sdr": best_sdr},
                             is_best=is_best, every=cfg.wandb.save_every)

    return {"best_sdr": float(best_sdr),
            "final_epoch": cfg.training.num_epochs - 1,
            "final_loss": mean_loss}
