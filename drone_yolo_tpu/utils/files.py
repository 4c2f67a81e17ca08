"""File/path helpers (reference `ultralytics/utils/files.py`)."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile
from contextlib import contextmanager
from datetime import datetime
from pathlib import Path


@contextmanager
def spaces_in_path(path):
    """Copy a space-containing path to a temp dir for tools that dislike spaces."""
    if " " in str(path):
        with tempfile.TemporaryDirectory() as tmp:
            tmp_path = Path(tmp) / Path(path).name.replace(" ", "_")
            if Path(path).is_dir():
                shutil.copytree(path, tmp_path)
            else:
                shutil.copy2(path, tmp_path)
            yield tmp_path
    else:
        yield Path(path)


def file_age(path) -> int:
    """Days since last modification."""
    dt = datetime.now() - datetime.fromtimestamp(Path(path).stat().st_mtime)
    return dt.days


def file_date(path) -> str:
    """File modification date as 'YYYY-M-D' (reference files.py)."""
    t = datetime.fromtimestamp(Path(path).stat().st_mtime)
    return f"{t.year}-{t.month}-{t.day}"


def file_size(path) -> float:
    """Size in MB (file or directory)."""
    p = Path(path)
    mb = 1 << 20
    if p.is_file():
        return p.stat().st_size / mb
    if p.is_dir():
        return sum(f.stat().st_size for f in p.glob("**/*") if f.is_file()) / mb
    return 0.0


def get_latest_run(search_dir: str = ".") -> str:
    """Newest runs/**/last checkpoint for --resume (reference files.py:180)."""
    paths = glob.glob(f"{search_dir}/**/last*.npz", recursive=True)
    return max(paths, key=os.path.getctime) if paths else ""


class WorkingDirectory:
    """Context manager / decorator that chdirs in and restores on exit
    (reference utils/files.py WorkingDirectory)."""

    def __init__(self, new_dir):
        self.dir = new_dir
        self.cwd = Path.cwd().resolve()

    def __call__(self, func):
        import functools

        @functools.wraps(func)
        def wrapper(*args, **kwargs):
            with self:
                return func(*args, **kwargs)

        return wrapper

    def __enter__(self):
        os.chdir(self.dir)
        return self

    def __exit__(self, *exc):
        os.chdir(self.cwd)
