"""Build dist/graftlouvain.zip for `spark-submit --py-files` (stdlib only,
deterministic: fixed timestamps + sorted entries, so repeated builds are
byte-identical)."""

from __future__ import annotations

import os
import zipfile
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def build(out: Path | None = None) -> Path:
    out = out or ROOT / "dist" / "graftlouvain.zip"
    out.parent.mkdir(parents=True, exist_ok=True)
    pkg = ROOT / "graftlouvain"
    entries = sorted(
        p for p in pkg.rglob("*.py") if "__pycache__" not in p.parts
    )
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for p in entries:
            info = zipfile.ZipInfo(str(p.relative_to(ROOT)), date_time=(1980, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            # a hand-built ZipInfo defaults to STORED, overriding the
            # ZipFile-level default — pass the compression explicitly
            zf.writestr(info, p.read_bytes(), compress_type=zipfile.ZIP_DEFLATED)
    return out


if __name__ == "__main__":
    path = build()
    print(f"wrote {path} ({os.path.getsize(path)} bytes)")
