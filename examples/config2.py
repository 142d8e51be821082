"""Config 2 (BASELINE.json:8) — thin wrapper over examples/run.py."""
import sys

from examples.run import main

if __name__ == "__main__":
    sys.argv.insert(1, "config2")
    main()
