"""Execute the REAL byte-level BPE tokenizer path (`text/tokenizer.py`).

The production path (``RobertaBpeTokenizer``) was previously only reachable
with an external vocab; here a tiny byte-level BPE is trained in-process on
the offline ``MUSIC_CORPUS`` (the ``tokenizers`` library is installed), saved
in BOTH on-disk formats the loader supports, and exercised end-to-end:
file loading, RoBERTa bos/eos framing (reference `ATHTDemucs_v2.py:19,239`
uses ``RobertaTokenizerFast``), padding/attention masks, the 512-position
truncation, and ``default_tokenizer`` selection via ``ATSM_TOKENIZER_DIR``.
"""

import numpy as np
import pytest

from audio_to_sheet_music_tpu.text.tokenizer import (
    BOS, EOS, MAX_TOKENS, PAD, HashTokenizer, RobertaBpeTokenizer,
    default_tokenizer)
from audio_to_sheet_music_tpu.text.word2vec import MUSIC_CORPUS

tokenizers = pytest.importorskip("tokenizers")


@pytest.fixture(scope="module")
def vocab_dirs(tmp_path_factory):
    """Train a tiny byte-level BPE on the offline corpus; save it both as
    ``tokenizer.json`` and as ``vocab.json``+``merges.txt`` (separate dirs so
    each loader branch is forced)."""
    from tokenizers import ByteLevelBPETokenizer
    from tokenizers.processors import RobertaProcessing

    bpe = ByteLevelBPETokenizer()
    bpe.train_from_iterator(
        MUSIC_CORPUS, vocab_size=400, min_frequency=1,
        special_tokens=["<s>", "<pad>", "</s>", "<unk>"])

    raw_dir = tmp_path_factory.mktemp("bpe_raw")
    bpe.save_model(str(raw_dir))            # vocab.json + merges.txt

    json_dir = tmp_path_factory.mktemp("bpe_json")
    full = bpe._tokenizer                   # underlying tokenizers.Tokenizer
    full.post_processor = RobertaProcessing(sep=("</s>", EOS),
                                            cls=("<s>", BOS))
    full.save(str(json_dir / "tokenizer.json"))
    return raw_dir, json_dir


class TestRobertaBpeTokenizer:
    @pytest.mark.parametrize("which", ["raw", "json"])
    def test_framing_and_mask(self, vocab_dirs, which):
        d = vocab_dirs[0] if which == "raw" else vocab_dirs[1]
        tok = RobertaBpeTokenizer(d)
        ids, mask = tok(["drums", "the sound of vocals"])
        assert ids.dtype == np.int32 and mask.dtype == np.int32
        assert ids.shape == mask.shape and ids.shape[0] == 2
        for row, m in zip(ids, mask):
            n = int(m.sum())
            assert row[0] == BOS and row[n - 1] == EOS
            assert (row[n:] == PAD).all() and (m[:n] == 1).all()
        # real subword content between the specials
        assert int(mask[1].sum()) > int(mask[0].sum()) >= 3

    def test_both_branches_agree(self, vocab_dirs):
        """vocab.json+merges and tokenizer.json must produce identical ids
        (same model, two serialisations)."""
        raw_dir, json_dir = vocab_dirs
        prompts = ["drums", "bass guitar sound", "the vocals of a song"]
        ids_a, mask_a = RobertaBpeTokenizer(raw_dir)(prompts)
        ids_b, mask_b = RobertaBpeTokenizer(json_dir)(prompts)
        np.testing.assert_array_equal(ids_a, ids_b)
        np.testing.assert_array_equal(mask_a, mask_b)

    def test_truncation_to_512_positions(self, vocab_dirs):
        tok = RobertaBpeTokenizer(vocab_dirs[0])
        ids, mask = tok([" ".join(["drums"] * 600), "bass"])
        assert ids.shape[1] == MAX_TOKENS
        assert ids[0, 0] == BOS and ids[0, -1] == EOS
        assert int(mask[0].sum()) == MAX_TOKENS
        # short row in the same batch still padded/framed correctly
        n = int(mask[1].sum())
        assert ids[1, 0] == BOS and ids[1, n - 1] == EOS
        assert (ids[1, n:] == PAD).all()

    def test_deterministic(self, vocab_dirs):
        tok = RobertaBpeTokenizer(vocab_dirs[1])
        a = tok(["guitar sound"])
        b = tok(["guitar sound"])
        np.testing.assert_array_equal(a[0], b[0])


class TestDefaultTokenizerSelection:
    def test_env_dir_selects_real_bpe(self, vocab_dirs, monkeypatch):
        monkeypatch.setenv("ATSM_TOKENIZER_DIR", str(vocab_dirs[0]))
        tok = default_tokenizer()
        assert isinstance(tok, RobertaBpeTokenizer)
        # require_real must ALSO pass now (the pretrained-weights gate)
        tok = default_tokenizer(require_real=True)
        assert isinstance(tok, RobertaBpeTokenizer)

    def test_explicit_path_beats_env(self, vocab_dirs, monkeypatch, tmp_path):
        monkeypatch.setenv("ATSM_TOKENIZER_DIR", str(tmp_path))  # empty dir
        tok = default_tokenizer(vocab_path=vocab_dirs[1])
        assert isinstance(tok, RobertaBpeTokenizer)

    def test_no_vocab_falls_back_or_refuses(self, monkeypatch):
        monkeypatch.delenv("ATSM_TOKENIZER_DIR", raising=False)
        assert isinstance(default_tokenizer(), HashTokenizer)
        with pytest.raises(RuntimeError, match="BPE vocabulary"):
            default_tokenizer(require_real=True)
