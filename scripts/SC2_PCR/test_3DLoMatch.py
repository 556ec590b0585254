"""Standalone SC2-PCR 3DLoMatch benchmark (reference test_3DLoMatch.py)."""
from test_3DMatch import main

if __name__ == "__main__":
    main("config_3DLoMatch.json")
