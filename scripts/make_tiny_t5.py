"""Generate the committed tiny-T5 test asset (tests/assets/tiny-t5).

Round-2 VERDICT item 3: the genuine `transformers` T5 path
(tokenize -> mask -> FlaxT5EncoderModel encode) was dead code in the
zero-egress CI image — every run used the deterministic fallback
embedder. This script builds a ~1 MB random-init T5 encoder the real
code path can load offline:

* ByT5 tokenizer (byte-level, vocab-file-free — the only genuine HF T5
  tokenizer constructible without a sentencepiece model, which this
  image cannot train); same tokenizer family as google/byt5-*.
* T5Config(d_model=64, 2 layers, vocab 384) saved via
  FlaxT5EncoderModel.save_pretrained -> flax msgpack.

Deterministic: fixed HF seed, so regenerating produces identical bytes.
Run once, commit the output:  python scripts/make_tiny_t5.py
"""

import pathlib
import sys

OUT = pathlib.Path(__file__).resolve().parent.parent / "tests" / "assets" / "tiny-t5"


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from transformers import ByT5Tokenizer, FlaxT5EncoderModel, T5Config, set_seed

    set_seed(0)
    cfg = T5Config(
        vocab_size=384,  # ByT5: 256 bytes + 3 special + 125 extra ids
        d_model=64,
        d_kv=16,
        d_ff=128,
        num_layers=2,
        num_heads=4,
        feed_forward_proj="gated-gelu",  # the t5-v1_1 block (reference's family)
        tie_word_embeddings=False,
        decoder_start_token_id=0,
    )
    model = FlaxT5EncoderModel(cfg, seed=0)
    tok = ByT5Tokenizer()
    OUT.mkdir(parents=True, exist_ok=True)
    model.save_pretrained(OUT)
    tok.save_pretrained(OUT)
    size = sum(f.stat().st_size for f in OUT.iterdir())
    print(f"wrote {OUT} ({size/1e6:.2f} MB):", sorted(p.name for p in OUT.iterdir()))
    return 0


if __name__ == "__main__":
    sys.exit(main())
