"""Native (C++) host-side components with pure-Python fallbacks."""
