"""Native (C++) host-side components."""

from .bindings import load_library, HostLatticeBuilder, native_available  # noqa: F401
