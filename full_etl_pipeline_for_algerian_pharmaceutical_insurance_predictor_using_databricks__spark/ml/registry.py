"""Versioned model registry on plain storage — the MLflow-registry /
Unity-Catalog-model shape built from the pieces this repo already has:
Spark ML native persistence (`pipeline.save_model`) for the artifacts
and atomic pointer files for stage aliases.

Layout under a registry root:

    <root>/versions/v<k>/            — immutable Spark ML model + metadata
    <root>/aliases/<stage>           — one-line pointer file: "v<k>"

Contracts (tested in tests/test_ml.py):

- `register` allocates the next version atomically-enough for a single
  writer (the training job); versions are immutable once written.
- `promote` swaps a stage alias (e.g. "production") by writing a temp
  pointer and `os.replace`-ing it — readers never observe a partial
  pointer (rename atomicity, the same primitive `sources/sinks.py`
  builds its swaps on).
- `rollback` is just `promote` to an older version — nothing is
  deleted, so any previous production model can be reinstated and
  audited (reference parity: the notebook pickles ONE model file and
  overwrites it, ML:274-282; the registry is what that becomes in
  production).

At scale the artifacts live on object storage via the Hadoop writer;
the pointer files become a catalog table — same contract, same reads.
"""

from __future__ import annotations

import json
import os
import re
import time

from pyspark.sql import SparkSession
from pyspark.ml import PipelineModel

_VERSION_RE = re.compile(r"^v(\d+)$")


def _versions_dir(root: str) -> str:
    return os.path.join(root, "versions")


def _alias_path(root: str, stage: str) -> str:
    return os.path.join(root, "aliases", stage)


def list_versions(root: str) -> list[int]:
    """Sorted registered version numbers (empty for a fresh root)."""
    vdir = _versions_dir(root)
    if not os.path.isdir(vdir):
        return []
    out = []
    for name in os.listdir(vdir):
        m = _VERSION_RE.match(name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def register(result, root: str, extra_meta: dict | None = None) -> int:
    """Persist a TrainResult as the next immutable version; returns the
    version number.  The artifact is written to a work dir and renamed
    in, so a crashed registration never leaves a half-version visible."""
    from .pipeline import save_model

    versions = list_versions(root)
    version = (versions[-1] + 1) if versions else 1
    vdir = _versions_dir(root)
    os.makedirs(vdir, exist_ok=True)
    final = os.path.join(vdir, f"v{version}")
    work = os.path.join(vdir, f"_work-v{version}")
    if os.path.isdir(work):
        import shutil

        shutil.rmtree(work)
    save_model(result, work)
    reg_meta = {
        "version": version,
        "registered_at_unix": int(time.time()),
        **(extra_meta or {}),
    }
    with open(os.path.join(work, "registry_metadata.json"), "w") as f:
        json.dump(reg_meta, f, indent=2)
    os.rename(work, final)
    return version


def promote(root: str, version: int, stage: str = "production") -> None:
    """Point `stage` at `version` atomically (temp write + os.replace).
    Rejects unknown versions instead of dangling the pointer."""
    if version not in list_versions(root):
        raise ValueError(f"version v{version} is not registered under {root}")
    adir = os.path.dirname(_alias_path(root, stage))
    os.makedirs(adir, exist_ok=True)
    tmp = _alias_path(root, stage) + ".tmp"
    with open(tmp, "w") as f:
        f.write(f"v{version}")
    os.replace(tmp, _alias_path(root, stage))


def resolve(root: str, stage: str = "production") -> int | None:
    """The version a stage currently points at (None if unset)."""
    path = _alias_path(root, stage)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        name = f.read().strip()
    m = _VERSION_RE.match(name)
    if not m:
        raise ValueError(f"corrupt alias pointer {path!r}: {name!r}")
    return int(m.group(1))


def load_stage(
    spark: SparkSession, root: str, stage: str = "production"
) -> tuple[PipelineModel, dict]:
    """Load the model + merged metadata behind a stage alias."""
    version = resolve(root, stage)
    if version is None:
        raise FileNotFoundError(f"no version promoted to {stage!r} under {root}")
    vpath = os.path.join(_versions_dir(root), f"v{version}")
    model = PipelineModel.load(vpath)
    meta: dict = {}
    for name in ("training_metadata.json", "registry_metadata.json"):
        p = os.path.join(vpath, name)
        if os.path.exists(p):
            with open(p) as f:
                meta.update(json.load(f))
    return model, meta


def rollback(root: str, stage: str = "production") -> int:
    """Re-point `stage` at the highest registered version BELOW the
    current one; returns the new version.  Raises if there is nothing
    to roll back to."""
    current = resolve(root, stage)
    if current is None:
        raise FileNotFoundError(f"stage {stage!r} has no current version")
    older = [v for v in list_versions(root) if v < current]
    if not older:
        raise ValueError(f"no version below v{current} to roll back to")
    promote(root, older[-1], stage)
    return older[-1]
