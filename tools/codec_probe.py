"""Codec/runtime probe (VERDICT r4 "Next round" #6): report which real
image/audio/ML runtimes exist in this environment, so the honest-stub
boundaries (operators/imagecodec.py JPEG decode, operators/clipscore.py
encoders) can be wired to real implementations when available and the
probe log documents absence when not. One JSON line on stdout.

Usage: python tools/codec_probe.py
"""

from __future__ import annotations

import importlib
import json
import shutil

MODULES = [
    "PIL",            # libjpeg-backed decode for imagecodec.decode
    "cv2",            # alternative decode path
    "onnxruntime",    # CLIP-seam encoder runtime (tests/test_clip_seam.py)
    "torch",          # alternative encoder runtime
    "soundfile",      # audio codec beyond the pure-python RIFF/PCM parser
]
BINARIES = ["djpeg", "convert", "ffmpeg", "pdftotext", "antiword"]


def main() -> None:
    mods = {}
    for m in MODULES:
        try:
            mod = importlib.import_module(m)
            mods[m] = getattr(mod, "__version__", "present")
        except ImportError:
            mods[m] = None
    bins = {b: shutil.which(b) for b in BINARIES}
    print(json.dumps({
        "mode": "codec-probe",
        "python_modules": mods,
        "binaries": bins,
        "decode_seam_wired": any(mods[m] for m in ("PIL", "cv2")),
        "clip_seam_wired": any(mods[m] for m in ("onnxruntime", "torch")),
    }))


if __name__ == "__main__":
    main()
