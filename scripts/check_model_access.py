#!/usr/bin/env python
"""Probe HF hub access for the cascade's model hierarchy before a download.

Role parity: reference ``experiments/scripts/check_model_access.py`` (login
check + per-model access probe + alternatives table). TPU-first differences:
the probe targets the Qwen2.5 hierarchy this framework serves (ungated, so
the common failure mode is network/token, not gating), checks LOCAL
checkpoint presence first (an offline box with weights on disk needs no hub
access at all), and degrades gracefully offline — every probe failure is a
reported row, never a crash.

Usage:
    python scripts/check_model_access.py [--models qwen2.5-7b ...] [--json]
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

TARGET_MODELS = {
    "qwen2.5-7b": "Qwen/Qwen2.5-7B-Instruct",
    "qwen2.5-14b": "Qwen/Qwen2.5-14B-Instruct",
    "qwen2.5-32b": "Qwen/Qwen2.5-32B-Instruct",
    "qwen2.5-72b": "Qwen/Qwen2.5-72B-Instruct",
}

# gated families a deployment might substitute in (parity with the
# reference's Llama-centric probe, which is where gating actually bites)
GATED_EXAMPLES = {
    "llama-3.1-8b": "meta-llama/Llama-3.1-8B-Instruct",
    "llama-3.1-70b": "meta-llama/Llama-3.1-70B-Instruct",
}


def check_login() -> dict:
    if not os.environ.get("HF_TOKEN") and not (
        pathlib.Path.home() / ".cache/huggingface/token"
    ).exists():
        return {"status": "no-token",
                "note": "set HF_TOKEN or `huggingface-cli login` (ungated "
                        "Qwen weights download anonymously; gated ones do not)"}
    try:
        from huggingface_hub import whoami

        info = whoami()
        return {"status": "logged-in", "username": info.get("name", "?")}
    except Exception as exc:  # noqa: BLE001 — offline/expired are report rows
        return {"status": "token-present-unverified", "error": str(exc)[:120]}


def check_local(alias: str, roots=("checkpoints", "models")) -> str | None:
    """A usable local checkpoint dir (config.json + safetensors) wins over
    any hub probe."""
    from adaptive_sd_tpu.models.loader import spec_from_checkpoint

    for root in roots:
        for cand in (pathlib.Path(root) / alias,
                     pathlib.Path(root) / alias.replace("qwen", "Qwen")):
            if (cand / "config.json").exists() and list(cand.glob("*.safetensors")):
                try:
                    spec_from_checkpoint(str(cand))
                    return str(cand)
                except Exception:  # noqa: BLE001
                    continue
    return None


def probe_hub(repo: str) -> dict:
    """Lightest-first access probe: metadata, then config download."""
    try:
        from huggingface_hub import HfApi

        api = HfApi()
        info = api.model_info(repo, timeout=10)
        return {"status": "accessible", "method": "model_info",
                "gated": bool(getattr(info, "gated", False))}
    except Exception as exc:  # noqa: BLE001
        msg = str(exc)
        if "401" in msg or "403" in msg or "gated" in msg.lower():
            return {"status": "gated-or-unauthorized", "error": msg[:120]}
        return {"status": "unreachable", "error": msg[:120],
                "note": "offline environment: rely on local checkpoints "
                        "(scripts/download_models.py --verify-only)"}


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--models", nargs="+", default=list(TARGET_MODELS))
    ap.add_argument("--gated-examples", action="store_true",
                    help="also probe the gated Llama examples")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    report = {"login": check_login(), "models": {}}
    targets = {a: TARGET_MODELS.get(a, a) for a in args.models}
    if args.gated_examples:
        targets.update(GATED_EXAMPLES)
    for alias, repo in targets.items():
        local = check_local(alias)
        if local:
            report["models"][alias] = {"status": "local", "path": local}
            continue
        report["models"][alias] = dict(probe_hub(repo), repo=repo)

    if args.json:
        print(json.dumps(report, indent=1))
    else:
        lg = report["login"]
        print(f"login: {lg['status']}"
              + (f" ({lg.get('username')})" if lg.get("username") else ""))
        for alias, row in report["models"].items():
            extra = row.get("path") or row.get("repo") or ""
            print(f"  {alias:14s} {row['status']:24s} {extra}")
        bad = [a for a, r in report["models"].items()
               if r["status"] in ("gated-or-unauthorized",)]
        if bad:
            print(f"\ngated/unauthorized: {', '.join(bad)} — request access "
                  "on the hub page, then `huggingface-cli login`")
    sys.exit(0)


if __name__ == "__main__":
    main()
