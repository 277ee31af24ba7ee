"""Content-addressed artifact sink (reference S7: Pinata/IPFS upload,
``services/pinata_uploader.py:10-159``).

The reference pins a CSV artifact to IPFS via Pinata and records the
gateway URL. The Spark-relevant parts — computing the content id over
the artifact bytes, deduplicating by content, and recording a stable
URI — are implemented for real. ``upload`` pins into a pluggable
content-addressed store:

* ``LocalCAS`` (default) — a filesystem CAS laid out like an IPFS
  block store (``<root>/<cid[:2]>/<cid>/<basename>``): idempotent
  (re-pinning identical bytes is a no-op, exactly IPFS semantics),
  deterministic, fully testable offline.
* a remote pinning service (the reference's Pinata) plugs in by
  implementing the same two-method interface with HTTP calls; network
  access and credentials are deployment concerns, not engine ones.
"""

from __future__ import annotations

import hashlib
import os
import shutil


def content_id(path: str) -> str:
    """Deterministic content id (sha256 hex — stands in for a CID)."""
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def artifact_uri(path: str, gateway: str = "https://gateway.invalid/ipfs") -> str:
    """Gateway URL for a local artifact — the column the reference's
    API returns (``pinata_url``)."""
    return f"{gateway}/{content_id(path)}/{os.path.basename(path)}"


class LocalCAS:
    """Filesystem content-addressed store with IPFS pin semantics:
    ``pin`` is idempotent on content, ``has`` answers by cid."""

    def __init__(self, root: str):
        self.root = root

    def _dir(self, cid: str) -> str:
        return os.path.join(self.root, cid[:2], cid)

    def has(self, cid: str) -> bool:
        d = self._dir(cid)
        return os.path.isdir(d) and bool(os.listdir(d))

    def pin(self, path: str, cid: str) -> str:
        d = self._dir(cid)
        dest = os.path.join(d, os.path.basename(path))
        if not os.path.exists(dest):  # idempotent re-pin
            os.makedirs(d, exist_ok=True)
            tmp = dest + ".tmp"
            shutil.copyfile(path, tmp)
            os.replace(tmp, dest)  # atomic publish
        return dest


def upload(path: str, store: LocalCAS | None = None, jwt: str | None = None) -> dict:
    """Pin an artifact; returns ``{cid, uri, pinned_path, already_pinned}``
    — the reference's upload-response shape (``IpfsHash`` + gateway URL,
    ``services/pinata_uploader.py:10-159``). ``store`` defaults to a
    ``LocalCAS`` under ``$SPARK_GRAFT_CAS`` (or ``/tmp/spark_graft_cas``);
    pass a remote-backed store for an actual pinning service."""
    if store is None:
        store = LocalCAS(os.environ.get("SPARK_GRAFT_CAS", "/tmp/spark_graft_cas"))
    cid = content_id(path)
    already = store.has(cid)
    pinned = store.pin(path, cid)
    return {
        "cid": cid,
        "uri": artifact_uri(path),
        "pinned_path": pinned,
        "already_pinned": already,
    }
