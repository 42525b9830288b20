"""Root conftest: make the in-repo package importable regardless of how
pytest is invoked (python -m pytest adds CWD; bare pytest does not)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
