"""CLI: convert a local HF Qwen2 checkpoint into an LCRec backbone artifact.

Usage: python scripts/convert_qwen2.py <hf_checkpoint_dir> <out_dir>

The artifact (orbax params + config.json + tokenizer.json) is consumed by
``LCRec.from_qwen2_backbone`` / the lcrec trainer's ``train.backbone`` gin
knob. See genrec_tpu/interop.py:convert_qwen2_checkpoint.
"""
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from genrec_tpu.interop import convert_qwen2_checkpoint  # noqa: E402

if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    cfg = convert_qwen2_checkpoint(sys.argv[1], sys.argv[2])
    print(f"converted: {cfg['model']}")
