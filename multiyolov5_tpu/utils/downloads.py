"""Weight download helpers (reference utils/google_utils.py).

``attempt_download`` resolves missing weights from GitHub release URLs like
the reference (:19-53); in air-gapped environments it degrades to a clear
error instead of hanging.
"""

from __future__ import annotations

import os
from pathlib import Path

RELEASE_URL = "https://github.com/ultralytics/yolov5/releases/download/v5.0/"


def attempt_download(file: str, repo_url: str = RELEASE_URL) -> str:
    file = str(file).strip().replace("'", "")
    if not file or os.path.isfile(file):
        return file
    name = Path(file).name
    url = repo_url + name
    try:
        import urllib.request

        print(f"Downloading {url} to {file}...")
        Path(file).parent.mkdir(parents=True, exist_ok=True)
        urllib.request.urlretrieve(url, file)
        assert os.path.getsize(file) > 1e6, "downloaded file too small"
        return file
    except Exception as e:
        if os.path.exists(file):
            os.remove(file)
        raise FileNotFoundError(
            f"weights {file!r} not found locally and download failed ({e}). "
            f"Place the checkpoint manually (offline environment?).") from e


def gdrive_download(id: str, file: str) -> str:  # pragma: no cover
    """Google-Drive fetch (reference google_utils.py:55+); same offline
    degradation."""
    try:
        import urllib.request

        url = f"https://drive.google.com/uc?export=download&id={id}"
        urllib.request.urlretrieve(url, file)
        return file
    except Exception as e:
        raise FileNotFoundError(
            f"gdrive download of {id} failed ({e}); offline environment?") from e
