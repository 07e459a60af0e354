#!/usr/bin/env python
"""Model download + verification.

Role parity: reference ``scripts/download_models.py`` /
``download_qwen3_models.py`` (HF snapshot download with disk-space check and
post-download verification). Uses huggingface_hub when importable and the
environment has network; verification (``models.loader.verify_checkpoint``)
also runs standalone against already-present checkpoints.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import shutil
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from adaptive_sd_tpu.models import get_spec
from adaptive_sd_tpu.models.loader import verify_checkpoint

DEFAULT_MODELS = {
    "qwen2.5-7b": "Qwen/Qwen2.5-7B-Instruct",
    "qwen2.5-14b": "Qwen/Qwen2.5-14B-Instruct",
    "qwen2.5-32b": "Qwen/Qwen2.5-32B-Instruct",
    "qwen2.5-72b": "Qwen/Qwen2.5-72B-Instruct",
}


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dest", default="models")
    ap.add_argument("--models", nargs="+", default=list(DEFAULT_MODELS))
    ap.add_argument("--verify-only", action="store_true")
    args = ap.parse_args()

    dest = pathlib.Path(args.dest)
    results = {}
    for name in args.models:
        spec = get_spec(name)
        target = dest / name
        if not args.verify_only and not target.exists():
            free_gb = shutil.disk_usage(dest.parent if dest.exists() else ".").free / 1e9
            need_gb = spec.weight_bytes(16) / 1e9 * 1.1
            if free_gb < need_gb:
                results[name] = {"ok": False, "issues": [
                    f"insufficient disk: need ~{need_gb:.0f}GB, free {free_gb:.0f}GB"]}
                continue
            try:
                from huggingface_hub import snapshot_download
            except ImportError:
                results[name] = {"ok": False, "issues": [
                    "huggingface_hub not installed; place safetensors under "
                    f"{target} manually"]}
                continue
            try:
                snapshot_download(
                    DEFAULT_MODELS.get(name, name),
                    local_dir=str(target),
                    allow_patterns=["*.safetensors", "*.json", "tokenizer*"],
                )
            except Exception as exc:  # noqa: BLE001 - network/etc
                results[name] = {"ok": False, "issues": [f"download failed: {exc}"]}
                continue
        if target.exists():
            results[name] = verify_checkpoint(str(target), spec)
        else:
            results[name] = {"ok": False, "issues": ["not present"]}
    print(json.dumps(results, indent=1))
    if not all(r.get("ok") for r in results.values()):
        sys.exit(1)


if __name__ == "__main__":
    main()
