"""Load individual reference modules for behavioral parity tests.

The reference package as a whole cannot be imported (its ``llava/__init__.py``
pulls in model registration that clashes with modern transformers), so we load
single files with stubbed-out parent packages. Tests using this skip cleanly
when /root/reference is not mounted.
"""

import importlib.machinery
import importlib.util
import sys
import types
from pathlib import Path

REFERENCE_ROOT = Path("/root/reference")


def reference_available() -> bool:
    return REFERENCE_ROOT.exists()


def _stub_torchvision():
    """The reference imports torchvision only for F.resize in get_raw_images;
    provide a PIL-backed stand-in so the module loads without torchvision."""
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    transforms = types.ModuleType("torchvision.transforms")
    functional = types.ModuleType("torchvision.transforms.functional")
    for m in (tv, transforms, functional):
        m.__spec__ = importlib.machinery.ModuleSpec(m.__name__, loader=None)
    tv.__version__ = "0.0.0-stub"

    def resize(img, size):
        h, w = size
        return img.resize((w, h))

    functional.resize = resize
    transforms.functional = functional
    tv.transforms = transforms
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.transforms.functional"] = functional


def load_reference_module(relpath: str, name: str):
    _stub_torchvision()
    """Load e.g. ``llava/conversation.py`` as a standalone module."""
    path = REFERENCE_ROOT / relpath
    # Stub the parent package so `from llava.constants import ...` works
    # without triggering the reference package __init__.
    if "llava" not in sys.modules or not hasattr(sys.modules.get("llava"), "__stub__"):
        pkg = types.ModuleType("llava")
        pkg.__stub__ = True
        pkg.__path__ = [str(REFERENCE_ROOT / "llava")]
        sys.modules["llava"] = pkg
    if "llava.constants" not in sys.modules:
        spec = importlib.util.spec_from_file_location(
            "llava.constants", REFERENCE_ROOT / "llava/constants.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        sys.modules["llava.constants"] = mod
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod
