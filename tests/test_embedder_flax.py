"""Execute the Flax BERT embedder end to end with tiny random weights.

The production path loads `bert-base-uncased` from the HF cache
(models/embedder.py); in an air-gapped CI there are no weights, so this
test drives the SAME forward/pooling code (`FlaxBertEmbedder._forward`,
`get_embeddings_batch`) through an injected 2-layer random-weight
FlaxBertModel + a WordPiece tokenizer built from a tiny on-disk vocab.
Covers the reference's `BertEmbedder` behaviors
(/root/reference/bert_embeddings.py:53-158): mean/cls/max pooling,
attention-mask-correct mean under batch padding, max_length truncation,
and batch-vs-single consistency.
"""

import numpy as np
import pytest

from fhe_icp_tpu.models.embedder import FlaxBertEmbedder

_VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
          "the", "cat", "sat", "on", "a", "mat", "dog", "##s", "ran"]


@pytest.fixture(scope="module")
def tiny_bert(tmp_path_factory):
    transformers = pytest.importorskip("transformers")
    vocab_file = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    vocab_file.write_text("\n".join(_VOCAB) + "\n")
    tok = transformers.BertTokenizerFast(vocab_file=str(vocab_file),
                                         do_lower_case=True)
    cfg = transformers.BertConfig(
        vocab_size=len(_VOCAB), hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64)
    model = transformers.FlaxBertModel(cfg, seed=0)
    return FlaxBertEmbedder(max_length=16, tokenizer=tok, model=model)


def test_batch_shapes_and_dtype(tiny_bert):
    texts = ["the cat sat on a mat", "dogs ran", ""]
    out = tiny_bert.get_embeddings_batch(texts, batch_size=2)
    assert out.shape == (3, 32) and out.dtype == np.float32
    assert np.isfinite(out).all()


@pytest.mark.parametrize("pooling", ["mean", "cls", "max"])
def test_pooling_modes_deterministic(tiny_bert, pooling):
    a = tiny_bert.get_embedding("the cat sat", pooling=pooling)
    b = tiny_bert.get_embedding("the cat sat", pooling=pooling)
    assert a.shape == (32,)
    np.testing.assert_array_equal(a, b)


def test_mask_correct_mean_under_batch_padding(tiny_bert):
    """Mean pooling must ignore padding: a short text embedded alone and
    inside a batch with a longer neighbour must agree (the reference's
    attention-mask-weighted mean — bert_embeddings.py:82-96)."""
    alone = tiny_bert.get_embeddings_batch(["dogs ran"])[0]
    batched = tiny_bert.get_embeddings_batch(
        ["dogs ran", "the cat sat on a mat the cat sat"])[0]
    np.testing.assert_allclose(alone, batched, rtol=1e-5, atol=1e-6)


def test_truncation_to_max_length(tiny_bert):
    """Texts beyond max_length are truncated, not errored (reference
    bert_embeddings.py:30, 66-70)."""
    long_text = "the cat sat on a mat " * 50
    out = tiny_bert.get_embedding(long_text)
    # equal to the embedding of any extension: both truncate to 16 tokens
    out2 = tiny_bert.get_embedding(long_text + " dogs ran")
    assert out.shape == (32,)
    np.testing.assert_allclose(out, out2, rtol=1e-5, atol=1e-6)


def test_similar_texts_more_similar(tiny_bert):
    e1 = tiny_bert.get_embedding("the cat sat on the mat")
    e2 = tiny_bert.get_embedding("a cat sat on a mat")
    e3 = tiny_bert.get_embedding("dogs ran")
    sim_close = tiny_bert.compute_similarity(e1, e2)
    sim_far = tiny_bert.compute_similarity(e1, e3)
    assert -1.0 <= sim_far <= 1.0 and sim_close <= 1.0 + 1e-6
    assert sim_close > sim_far
