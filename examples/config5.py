"""Config 5 (BASELINE.json:11) — thin wrapper over examples/run.py."""
import sys

from examples.run import main

if __name__ == "__main__":
    sys.argv.insert(1, "config5")
    main()
