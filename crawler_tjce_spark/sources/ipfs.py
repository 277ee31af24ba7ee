"""Content-addressed artifact sink (reference S7: Pinata/IPFS upload,
``services/pinata_uploader.py:10-159``).

No network in this sandbox, and an external pinning service is not a
Spark concern — the distributed part is producing the content hash and
the artifact manifest. This module does that part for real (sha256 CID
surrogate over the artifact bytes, deterministic gateway URI) and stubs
the actual upload behind ``NotImplementedError``, exactly as the
multimodal decode stubs do.
"""

from __future__ import annotations

import hashlib
import os


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


def upload(path: str, jwt: str | None = None) -> str:
    """Real pinning upload — requires network + credentials; stubbed."""
    raise NotImplementedError(
        "external pinning service not available in this environment; "
        "use artifact_uri() for the deterministic content-addressed URI"
    )
