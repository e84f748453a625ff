"""Native Word2Vec leg of the embedding comparison (reference
`embedding_comparison.py:48-140, 428-486`)."""

import numpy as np

from audio_to_sheet_music_tpu.apps.embedding_tool import (analyze_clustering,
                                                          collect_prompts)
from audio_to_sheet_music_tpu.text import word2vec as w2v_mod


class TestWord2Vec:
    def test_training_covers_prompt_vocabulary(self):
        w2v = w2v_mod.Word2Vec.train(w2v_mod.MUSIC_CORPUS, dim=32, epochs=40)
        prompts, _ = collect_prompts()
        for p in prompts:
            assert any(w in w2v for w in w2v_mod._tokenize(p)), p

    def test_skipgram_learns_cooccurrence(self):
        """Words that share contexts end up closer than unrelated words."""
        w2v = w2v_mod.Word2Vec.train(w2v_mod.MUSIC_CORPUS, dim=32,
                                     epochs=200, seed=0)

        def cos(a, b):
            va, vb = w2v[a], w2v[b]
            return float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))

        related = np.mean([cos("violin", "viola"), cos("violin", "cello"),
                           cos("drums", "percussion"), cos("vocals", "singing")])
        unrelated = np.mean([cos("violin", "drums"), cos("cello", "vocals"),
                             cos("percussion", "singing")])
        assert related > unrelated

    def test_embed_texts_oov_handling(self):
        w2v = w2v_mod.Word2Vec.train(w2v_mod.MUSIC_CORPUS, dim=16, epochs=5)
        emb, kept, idx = w2v_mod.embed_texts(
            w2v, ["the drums", "zzzqqq xxyy", "bass guitar"])
        assert kept == ["the drums", "bass guitar"] and idx == [0, 2]
        assert emb.shape == (2, 16) and np.isfinite(emb).all()

    def test_clustering_block_is_real(self):
        """The report's word2vec block: real floats from real vectors."""
        w2v = w2v_mod.load_or_train(dim=32)
        prompts, cats = collect_prompts()
        emb, kept, idx = w2v_mod.embed_texts(w2v, prompts)
        assert len(kept) == len(prompts)     # full corpus coverage
        stats = analyze_clustering(emb, [cats[i] for i in idx])
        assert all(np.isfinite(v) for v in stats.values())
