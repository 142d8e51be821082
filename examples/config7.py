"""Config 7 — chunked heightmap-LOD terrain fly-through (clipmap rings,
measured auto-sized capacities). Thin wrapper over examples/run.py."""
import sys

from examples.run import main

if __name__ == "__main__":
    sys.argv.insert(1, "config7")
    main()
