"""Acquisition-stage utilities (SURVEY §2.1 S2/S3/S4) — driver-side, out of
the Spark engine proper, pluggable via ``PipelineConfig.acquire``.

The reference shells out to the Kaggle CLI
(/root/reference/src/ingestion_kaggle.py:94-132), unzips archives, and
quarantines files that don't match the configured retention patterns.
Rebuilt fresh: same lifecycle, plus the download step degrades gracefully
when no CLI/credentials exist (this container has neither).
"""

from __future__ import annotations

import fnmatch
import logging
import shutil
import subprocess
import tarfile
import zipfile
from pathlib import Path

log = logging.getLogger("walmart_retail_pipeline.acquire")


def download_kaggle_competition(
    competition: str, raw_dir: str | Path, timeout_s: int = 600
) -> bool:
    """Download competition data via the kaggle CLI if it is available and
    credentialed; returns False (without raising) otherwise so local-file
    pipelines proceed."""
    raw = Path(raw_dir)
    raw.mkdir(parents=True, exist_ok=True)
    if shutil.which("kaggle") is None:
        log.info("kaggle CLI not found; skipping download")
        return False
    try:
        subprocess.run(
            ["kaggle", "competitions", "download", "-c", competition, "-p", str(raw)],
            check=True,
            timeout=timeout_s,
            capture_output=True,
        )
        return True
    except (subprocess.SubprocessError, OSError) as exc:
        log.warning("kaggle download failed: %s", exc)
        return False


def extract_archives(raw_dir: str | Path) -> list[Path]:
    """Extract every .zip/.tar[.gz] in ``raw_dir`` in place; returns the
    archives processed."""
    raw = Path(raw_dir)
    done = []
    for p in sorted(raw.iterdir()):
        if p.suffix == ".zip":
            with zipfile.ZipFile(p) as zf:
                zf.extractall(raw)
            done.append(p)
        elif p.suffix in (".tar", ".tgz") or p.name.endswith(".tar.gz"):
            with tarfile.open(p) as tf:
                tf.extractall(raw, filter="data")
            done.append(p)
    return done


def retain_files(
    raw_dir: str | Path,
    patterns: list[str],
    quarantine: str = "_ignored",
) -> list[Path]:
    """Keep files matching any glob pattern; move the rest into a
    quarantine subdirectory. Returns the retained files."""
    raw = Path(raw_dir)
    qdir = raw / quarantine
    kept: list[Path] = []
    for p in sorted(raw.iterdir()):
        if not p.is_file():
            continue
        if any(fnmatch.fnmatch(p.name, pat) for pat in patterns):
            kept.append(p)
        else:
            qdir.mkdir(exist_ok=True)
            p.rename(qdir / p.name)
    return kept
