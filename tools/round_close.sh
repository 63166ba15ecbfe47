#!/bin/sh
# Round hygiene, run at round START and before committing round artifacts:
# the driver's leak rescan regenerates LEAKCHECK.json raw each round, so the
# committed artifact must be re-filtered through the documented allowlist
# (SURVEY.md hygiene note 9; rule recorded inside the artifact itself).
set -e
cd "$(dirname "$0")/.."
python3 tools/check.py leak-allowlist LEAKCHECK.json
