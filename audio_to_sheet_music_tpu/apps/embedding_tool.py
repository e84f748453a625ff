"""Prompt-embedding analysis tool (reference `embedding_comparison.py:66-543`).

    python -m audio_to_sheet_music_tpu.apps.embedding_tool \
        [--checkpoint ...] [--output-dir embedding_analysis] [--tensorboard]

Embeds the stem prompt vocabulary (+ the reference's extra instrument terms
violin/viola/cello) with the CLAP text tower, then reports:

- pairwise cosine-similarity matrix (PNG heatmap + JSON),
- 2-D PCA and t-SNE projections (PNG scatter, colored per stem category),
- intra- vs inter-category clustering separation statistics,
- optional TensorBoard embedding-projector export.

The Word2Vec comparison leg (reference `embedding_comparison.py:428-486`)
always runs: gensim KeyedVectors when ``ATSM_W2V_PATH`` provides local
vectors, otherwise the bundled native skip-gram (``text.word2vec``) trained
on an offline music corpus.  UMAP stays optional (skipped with a note).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

EXTRA_TERMS = ["violin", "viola", "cello"]   # reference embedding_comparison.py


def collect_prompts():
    from ..text.prompts import STEM_PROMPTS

    prompts, categories = [], []
    for stem, variants in STEM_PROMPTS.items():
        for v in variants:
            prompts.append(v)
            categories.append(stem)
    for term in EXTRA_TERMS:
        prompts.append(term)
        categories.append("strings")
    return prompts, categories


def embed_prompts(prompts, checkpoint=None, normalize=True) -> np.ndarray:
    import jax
    import jax.numpy as jnp

    from ..models import atht, clap_text
    from ..text.tokenizer import default_tokenizer

    # shared loader: .pt (converted, pretrained=True), .npz (native), or
    # random init; pretrained weights refuse the hash-tokenizer fallback
    full, pretrained = atht.load_params(checkpoint, jax.random.PRNGKey(0))
    params = full["clap"]
    ids, mask = default_tokenizer(require_real=pretrained)(prompts)
    fn = clap_text.get_text_features if normalize else clap_text.text_embeds
    # jit: eager per-op dispatch costs ~65 ms/op over a TPU tunnel
    return np.asarray(jax.jit(fn)(params, jnp.asarray(ids), jnp.asarray(mask)))


def analyze_clustering(emb: np.ndarray, categories) -> dict:
    """Intra/inter-category cosine similarity separation (reference
    ``analyze_clustering``)."""
    emb = emb / np.linalg.norm(emb, axis=-1, keepdims=True)
    sim = emb @ emb.T
    cats = np.asarray(categories)
    intra, inter = [], []
    n = len(cats)
    for i in range(n):
        for j in range(i + 1, n):
            (intra if cats[i] == cats[j] else inter).append(sim[i, j])
    return {
        "intra_category_mean": float(np.mean(intra)),
        "inter_category_mean": float(np.mean(inter)),
        "separation": float(np.mean(intra) - np.mean(inter)),
    }


def reduce_dimensions(emb: np.ndarray, method: str = "pca") -> np.ndarray:
    if method == "pca":
        from sklearn.decomposition import PCA

        return PCA(n_components=2).fit_transform(emb)
    if method == "tsne":
        from sklearn.manifold import TSNE

        perplexity = min(5, len(emb) - 1)
        return TSNE(n_components=2, perplexity=perplexity,
                    random_state=0).fit_transform(emb)
    if method == "umap":
        import umap  # optional

        return umap.UMAP(n_components=2, random_state=0).fit_transform(emb)
    raise ValueError(method)


def main() -> None:
    ap = argparse.ArgumentParser(description="Prompt embedding analysis")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--output-dir", default="embedding_analysis")
    ap.add_argument("--tensorboard", action="store_true")
    args = ap.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    prompts, categories = collect_prompts()
    emb = embed_prompts(prompts, args.checkpoint)

    report = {"prompts": prompts, "categories": categories,
              "clap": analyze_clustering(emb, categories)}

    # cosine-similarity heatmap
    sim = (emb / np.linalg.norm(emb, axis=-1, keepdims=True))
    sim = sim @ sim.T
    fig, ax = plt.subplots(figsize=(8, 7))
    im = ax.imshow(sim, cmap="viridis")
    ax.set_xticks(range(len(prompts)), prompts, rotation=90, fontsize=7)
    ax.set_yticks(range(len(prompts)), prompts, fontsize=7)
    fig.colorbar(im)
    fig.tight_layout()
    fig.savefig(out / "cosine_similarity.png", dpi=120)
    plt.close(fig)

    cat_names = sorted(set(categories))
    colors = {c: i for i, c in enumerate(cat_names)}
    for method in ("pca", "tsne", "umap"):
        try:
            pts = reduce_dimensions(emb, method)
        except ImportError:
            print(f"{method}: dependency unavailable, skipped")
            continue
        fig, ax = plt.subplots(figsize=(7, 6))
        ax.scatter(pts[:, 0], pts[:, 1],
                   c=[colors[c] for c in categories], cmap="tab10")
        for p, (x, y) in zip(prompts, pts):
            ax.annotate(p, (x, y), fontsize=7)
        ax.set_title(f"CLAP prompt embeddings — {method.upper()}")
        fig.tight_layout()
        fig.savefig(out / f"projection_{method}.png", dpi=120)
        plt.close(fig)

    # Word2Vec comparison (reference embedding_comparison.py:428-486):
    # gensim KeyedVectors when ATSM_W2V_PATH points at local vectors, else
    # the bundled native skip-gram trained on the offline music corpus.
    from ..text import word2vec as w2v_mod

    w2v = w2v_mod.load_or_train()
    w2v_emb, kept, kept_idx = w2v_mod.embed_texts(w2v, prompts)
    if len(kept) >= 2:
        kept_cats = [categories[i] for i in kept_idx]
        report["word2vec"] = {
            "backend": w2v.backend,
            "dim": int(w2v.dim),
            "n_prompts": len(kept),
            **analyze_clustering(w2v_emb, kept_cats),
        }
        wsim = w2v_emb / np.linalg.norm(w2v_emb, axis=-1, keepdims=True)
        wsim = wsim @ wsim.T
        fig, ax = plt.subplots(figsize=(8, 7))
        im = ax.imshow(wsim, cmap="viridis")
        ax.set_xticks(range(len(kept)), kept, rotation=90, fontsize=7)
        ax.set_yticks(range(len(kept)), kept, fontsize=7)
        ax.set_title("Word2Vec cosine similarity")
        fig.colorbar(im)
        fig.tight_layout()
        fig.savefig(out / "cosine_similarity_word2vec.png", dpi=120)
        plt.close(fig)
        pts = reduce_dimensions(w2v_emb, "pca")
        fig, ax = plt.subplots(figsize=(7, 6))
        ax.scatter(pts[:, 0], pts[:, 1],
                   c=[colors[c] for c in kept_cats], cmap="tab10")
        for p, (x, y) in zip(kept, pts):
            ax.annotate(p, (x, y), fontsize=7)
        ax.set_title("Word2Vec prompt embeddings — PCA")
        fig.tight_layout()
        fig.savefig(out / "projection_word2vec_pca.png", dpi=120)
        plt.close(fig)
        # the reference's headline contrast: CLAP vs Word2Vec separation
        report["comparison"] = {
            "clap_separation": report["clap"]["separation"],
            "word2vec_separation": report["word2vec"]["separation"],
        }

    if args.tensorboard:
        try:
            from torch.utils.tensorboard import SummaryWriter

            w = SummaryWriter(str(out / "tb"))
            w.add_embedding(emb, metadata=prompts, tag="clap_prompts")
            w.close()
        except Exception as e:  # noqa: BLE001
            report["tensorboard"] = f"skipped ({e})"

    (out / "report.json").write_text(json.dumps(report, indent=2))
    print(json.dumps(report["clap"], indent=2))
    print(f"analysis written to {out}")


if __name__ == "__main__":
    main()
