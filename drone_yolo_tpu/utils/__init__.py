"""Core runtime utilities: logging, YAML I/O, config namespace types, paths.

Capability parity with the reference's `ultralytics/utils/__init__.py` (LOGGER,
yaml_load/yaml_save, IterableSimpleNamespace, colorstr, TQDM) minus the
torch/CUDA-specific machinery, which has no TPU analog.
"""

from __future__ import annotations

import logging
import os
import re
import sys
import threading
import time
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import yaml

# ---------------------------------------------------------------------------
# Paths & process-role globals
# ---------------------------------------------------------------------------
PKG_ROOT = Path(__file__).resolve().parents[0].parent  # drone_yolo_tpu/
REPO_ROOT = PKG_ROOT.parent
DEFAULT_CFG_PATH = PKG_ROOT / "cfg" / "default.yaml"
ASSETS = PKG_ROOT / "assets"
NUM_THREADS = min(8, max(1, os.cpu_count() - 1)) if os.cpu_count() else 1

# JAX is single-controller: in a multi-host setting jax.process_index() plays the
# role the reference gives to RANK/LOCAL_RANK (utils/__init__.py:33-34). We read the
# env lazily so importing this module never initializes a backend.
RANK = int(os.environ.get("RANK", -1))
LOCAL_RANK = int(os.environ.get("LOCAL_RANK", -1))

VERBOSE = str(os.environ.get("YOLO_VERBOSE", True)).lower() == "true"


# ---------------------------------------------------------------------------
# Logging
# ---------------------------------------------------------------------------
def set_logging(name: str = "drone_yolo_tpu", verbose: bool = True) -> logging.Logger:
    """Configure a stream logger; idempotent."""
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    level = logging.INFO if verbose else logging.ERROR
    handler = logging.StreamHandler(sys.stdout)
    handler.setFormatter(logging.Formatter("%(message)s"))
    handler.setLevel(level)
    logger.setLevel(level)
    logger.addHandler(handler)
    logger.propagate = False
    return logger


LOGGER = set_logging(verbose=VERBOSE)


# ---------------------------------------------------------------------------
# TQDM: thin wrapper so code never depends on tqdm being importable
# ---------------------------------------------------------------------------
try:
    from tqdm import tqdm as _tqdm

    class TQDM(_tqdm):
        def __init__(self, *args, **kwargs):
            kwargs["disable"] = not VERBOSE or kwargs.get("disable", False)
            kwargs.setdefault("bar_format", "{l_bar}{bar:10}{r_bar}")
            super().__init__(*args, **kwargs)

except ImportError:  # pragma: no cover - tqdm is in the image, but stay safe

    class TQDM:  # type: ignore[no-redef]
        def __init__(self, iterable=None, total=None, desc="", **kwargs):
            self.iterable = iterable if iterable is not None else range(total or 0)
            self.desc = desc
            self.n = 0

        def __iter__(self):
            for x in self.iterable:
                self.n += 1
                yield x

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def update(self, n=1):
            self.n += n

        def set_description(self, d):
            self.desc = d

        def close(self):
            pass


# ---------------------------------------------------------------------------
# YAML I/O
# ---------------------------------------------------------------------------
def yaml_load(file: str | Path, append_filename: bool = False) -> dict:
    """Load a YAML file to a dict, tolerating non-ascii and scrubbing weird chars."""
    path = Path(file)
    assert path.suffix in {".yaml", ".yml"}, f"not a YAML file: {file}"
    with open(path, errors="ignore", encoding="utf-8") as f:
        s = f.read()
    if not s.isprintable():
        s = re.sub(r"[^\x09\x0A\x0D\x20-\x7E\x85\xA0-퟿-�\U00010000-\U0010ffff]+", "", s)
    data = yaml.safe_load(s) or {}
    if append_filename:
        data["yaml_file"] = str(file)
    return data


def yaml_save(file: str | Path, data: dict | None = None, header: str = "") -> None:
    """Save a dict to YAML, converting Paths and namespaces to plain types."""
    file = Path(file)
    file.parent.mkdir(parents=True, exist_ok=True)
    clean = {}
    for k, v in (data or {}).items():
        if isinstance(v, Path):
            v = str(v)
        elif isinstance(v, (SimpleNamespace, IterableSimpleNamespace)):
            v = vars(v)
        elif isinstance(v, np.generic):
            v = v.item()
        clean[k] = v
    with open(file, "w", errors="ignore", encoding="utf-8") as f:
        if header:
            f.write(header)
        yaml.safe_dump(clean, f, sort_keys=False, allow_unicode=True)


def yaml_print(data: dict | SimpleNamespace | str | Path) -> None:
    """Pretty-print a YAML-able object."""
    d = yaml_load(data) if isinstance(data, (str, Path)) else (vars(data) if isinstance(data, SimpleNamespace) else data)
    LOGGER.info(yaml.safe_dump(d, sort_keys=False, allow_unicode=True))


# ---------------------------------------------------------------------------
# Namespace / container types
# ---------------------------------------------------------------------------
class SimpleClass:
    """Base class giving readable repr and attribute error messages."""

    def __str__(self):
        attrs = []
        for a in dir(self):
            v = getattr(self, a)
            if not callable(v) and not a.startswith("_"):
                attrs.append(f"{a}: {v.__module__ + '.' + v.__class__.__name__ if hasattr(v, '__module__') and not isinstance(v, (int, float, str, bool, list, tuple, dict)) else v!r}")
        return f"{self.__class__.__module__}.{self.__class__.__name__} object with attributes:\n\n" + "\n".join(attrs)

    def __repr__(self):
        return self.__str__()

    def __getattr__(self, attr):
        raise AttributeError(f"'{self.__class__.__name__}' object has no attribute '{attr}'. See valid attributes below.\n{self.__doc__}")


class IterableSimpleNamespace(SimpleNamespace):
    """SimpleNamespace that supports iteration over (key, value) and dict-style get."""

    def __iter__(self):
        return iter(vars(self).items())

    def __str__(self):
        return "\n".join(f"{k}={v}" for k, v in vars(self).items())

    def __getattr__(self, attr):
        name = self.__class__.__name__
        raise AttributeError(f"'{name}' object has no attribute '{attr}'.")

    def get(self, key, default=None):
        return getattr(self, key, default)


# ---------------------------------------------------------------------------
# String / misc helpers
# ---------------------------------------------------------------------------
def colorstr(*input):
    """Colorize a string: colorstr('blue', 'bold', 'hello')."""
    *args, string = input if len(input) > 1 else ("blue", "bold", input[0])
    colors = {
        "black": "\033[30m", "red": "\033[31m", "green": "\033[32m", "yellow": "\033[33m",
        "blue": "\033[34m", "magenta": "\033[35m", "cyan": "\033[36m", "white": "\033[37m",
        "bright_black": "\033[90m", "bright_red": "\033[91m", "bright_green": "\033[92m",
        "bright_yellow": "\033[93m", "bright_blue": "\033[94m", "bright_magenta": "\033[95m",
        "bright_cyan": "\033[96m", "bright_white": "\033[97m",
        "end": "\033[0m", "bold": "\033[1m", "underline": "\033[4m",
    }
    return "".join(colors[x] for x in args) + f"{string}" + colors["end"]


def emojis(string: str = "") -> str:
    """Strip emojis on platforms that cannot print them (parity shim; no-op on linux)."""
    return string


class ThreadingLocked:
    """Decorator ensuring thread-safe execution of the wrapped function."""

    def __init__(self):
        self.lock = threading.Lock()

    def __call__(self, f):
        import functools

        @functools.wraps(f)
        def decorated(*args, **kwargs):
            with self.lock:
                return f(*args, **kwargs)

        return decorated


class TryExcept:
    """Context manager / decorator that logs instead of raising."""

    def __init__(self, msg="", verbose=True):
        self.msg = msg
        self.verbose = verbose

    def __enter__(self):
        return self

    def __exit__(self, exc_type, value, traceback):
        if self.verbose and value:
            LOGGER.warning(f"{self.msg}{': ' if self.msg else ''}{value}")
        return True

    def __call__(self, f):
        import functools

        @functools.wraps(f)
        def wrapped(*args, **kwargs):
            with self:
                return f(*args, **kwargs)

        return wrapped


class Retry:
    """Decorator retrying a function with exponential backoff."""

    def __init__(self, times=3, delay=1.0):
        self.times = times
        self.delay = delay

    def __call__(self, f):
        import functools

        @functools.wraps(f)
        def wrapped(*args, **kwargs):
            last = None
            for i in range(self.times):
                try:
                    return f(*args, **kwargs)
                except Exception as e:  # noqa: BLE001
                    last = e
                    time.sleep(self.delay * (2**i))
            raise last

        return wrapped


def threaded(func):
    """Run the decorated function in a daemon thread (returns the Thread unless threaded=False)."""
    import functools

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        if kwargs.pop("threaded", True):
            t = threading.Thread(target=func, args=args, kwargs=kwargs, daemon=True)
            t.start()
            return t
        return func(*args, **kwargs)

    return wrapper


def increment_path(path: str | Path, exist_ok: bool = False, sep: str = "", mkdir: bool = False) -> Path:
    """runs/exp -> runs/exp2, runs/exp3, ... unless exist_ok."""
    path = Path(path)
    if path.exists() and not exist_ok:
        base, suffix = (path.with_suffix(""), path.suffix) if path.is_file() else (path, "")
        for n in range(2, 9999):
            p = f"{base}{sep}{n}{suffix}"
            if not os.path.exists(p):
                path = Path(p)
                break
    if mkdir:
        path.mkdir(parents=True, exist_ok=True)
    return path


def clean_url(url: str) -> str:
    """Strip auth from a URL for display."""
    return re.sub(r"//.*?@", "//", str(url))


class JSONDict(dict):
    """Dict persisted to a JSON file on every mutation (reference utils/__init__.py:1080)."""

    def __init__(self, file_path: str | Path):
        super().__init__()
        self.file_path = Path(file_path)
        self._lock = threading.Lock()
        if self.file_path.exists():
            try:
                import json

                super().update(json.loads(self.file_path.read_text()))
            except (ValueError, OSError):
                pass

    def _save(self):
        import json

        self.file_path.parent.mkdir(parents=True, exist_ok=True)
        self.file_path.write_text(json.dumps(dict(self), indent=2))

    def __setitem__(self, k, v):
        with self._lock:
            super().__setitem__(k, v)
            self._save()

    def update(self, *a, **kw):
        with self._lock:
            super().update(*a, **kw)
            self._save()

    def reset(self):
        with self._lock:
            self.clear()
            self._save()


class SettingsManager(JSONDict):
    """Persistent user settings (reference utils/__init__.py:1173 SettingsManager)."""

    DEFAULTS = {
        "settings_version": "1.0.0",
        "datasets_dir": str(Path(os.environ.get("YOLO_DATASETS_DIR", Path.cwd() / "datasets"))),
        "weights_dir": "weights",
        "runs_dir": "runs",
        "sync": False,  # zero-egress: telemetry off
        "tensorboard": True,
        "wandb": False,
        "mlflow": False,
    }

    def __init__(self, file_path: str | Path | None = None):
        file_path = file_path or Path(os.environ.get("YOLO_CONFIG_DIR", Path.home() / ".config" / "drone_yolo_tpu")) / "settings.json"
        super().__init__(file_path)
        for k, v in self.DEFAULTS.items():
            dict.setdefault(self, k, v)


# Lazy singleton: created on first access to avoid writes at import time.
_SETTINGS = None


def get_settings() -> SettingsManager:
    """Lazily-created singleton SettingsManager (persistent user settings)."""
    global _SETTINGS
    if _SETTINGS is None:
        _SETTINGS = SettingsManager()
    return _SETTINGS


# Default configuration dict, loaded once (reference: utils/__init__.py:530-536).
DEFAULT_CFG_DICT = {k: (None if isinstance(v, str) and v.lower() == "none" else v) for k, v in yaml_load(DEFAULT_CFG_PATH).items()}
DEFAULT_CFG_KEYS = DEFAULT_CFG_DICT.keys()
DEFAULT_CFG = IterableSimpleNamespace(**DEFAULT_CFG_DICT)


# -- environment detection (reference utils/__init__.py:550-763) --------------
def is_colab() -> bool:
    """Running inside Google Colab."""
    return "COLAB_RELEASE_TAG" in os.environ or "COLAB_BACKEND_VERSION" in os.environ


def is_kaggle() -> bool:
    """Running inside a Kaggle kernel."""
    return os.environ.get("PWD") == "/kaggle/working" and os.environ.get("KAGGLE_URL_BASE") == "https://www.kaggle.com"


def is_jupyter() -> bool:
    """Running inside a Jupyter/IPython kernel."""
    try:
        from IPython import get_ipython  # noqa: PLC0415

        return get_ipython() is not None
    except ImportError:
        return False


def is_docker() -> bool:
    """Running inside a Docker container."""
    try:
        with open("/proc/self/cgroup") as f:
            return "docker" in f.read()
    except OSError:
        return False


def is_github_action_running() -> bool:
    """True when running inside a GitHub Actions workflow."""
    return "GITHUB_ACTIONS" in os.environ and "GITHUB_WORKFLOW" in os.environ and "RUNNER_OS" in os.environ


def is_dir_writeable(dir_path) -> bool:
    """Directory exists and is writeable."""
    return os.access(str(dir_path), os.W_OK)


def is_online() -> bool:
    """Cheap connectivity probe (1.1.1.1:443, 1s timeout); False offline."""
    import socket

    try:
        socket.create_connection(("1.1.1.1", 443), timeout=1.0).close()
        return True
    except OSError:
        return False


def get_git_dir():
    """Path to the enclosing .git directory, or None."""
    for d in [Path(__file__).resolve(), *Path(__file__).resolve().parents]:
        if (d / ".git").is_dir():
            return d / ".git"
    return None


def is_git_dir() -> bool:
    """True when the working tree is inside a git repository."""
    return get_git_dir() is not None


def _git(*args: str):
    import subprocess

    try:
        out = subprocess.run(["git", *args], capture_output=True, text=True, timeout=5, cwd=Path(__file__).parent)
        return out.stdout.strip() or None if out.returncode == 0 else None
    except (OSError, subprocess.SubprocessError):
        return None


def get_git_origin_url():
    """Remote origin URL of the enclosing repo, or None."""
    return _git("config", "--get", "remote.origin.url") if is_git_dir() else None


def get_git_branch():
    """Current branch name, or None."""
    return _git("rev-parse", "--abbrev-ref", "HEAD") if is_git_dir() else None


_COMPILE_CACHE_SET = False


def enable_compile_cache(path: str | Path | None = None):
    """Point JAX at a persistent on-disk compilation cache (idempotent).

    The flagship P2 train step takes minutes to compile over the TPU tunnel;
    caching makes every later trainer/validator/bench process start warm. The
    reference has no analog (torch eager); for XLA this is table stakes.
    Override location with DYT_COMPILE_CACHE; respects an explicitly
    pre-configured jax_compilation_cache_dir.
    """
    global _COMPILE_CACHE_SET
    if _COMPILE_CACHE_SET:
        return
    import jax

    if jax.config.jax_compilation_cache_dir:
        _COMPILE_CACHE_SET = True
        return
    cache = Path(os.environ.get("DYT_COMPILE_CACHE") or path or Path.home() / ".cache" / "drone_yolo_tpu" / "jax")
    try:
        cache.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # noqa: BLE001 - cache is best-effort
        LOGGER.warning(f"compile cache unavailable: {e}")
    _COMPILE_CACHE_SET = True
