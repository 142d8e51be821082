"""Config 6 (loaded-asset courtyard) — thin wrapper over examples/run.py."""
import sys

from examples.run import main

if __name__ == "__main__":
    sys.argv.insert(1, "config6")
    main()
