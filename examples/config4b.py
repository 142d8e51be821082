"""Config 4b (blended transparency) — thin wrapper over examples/run.py."""
import sys

from examples.run import main

if __name__ == "__main__":
    sys.argv.insert(1, "config4b")
    main()
