"""spark-submit entry shim: the engine arrives via --py-files (a zip on
the executor/driver PYTHONPATH), so this file only forwards to the
package CLI. Keeps cluster submission and `python -m logagent_spark`
one code path."""

import sys

from logagent_spark.__main__ import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
