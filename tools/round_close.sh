#!/bin/bash
# Round-close test gate (round-12 verdict task #7): run the full
# ScalaTest suite and splice its summary lines VERBATIM into PERF.md
# between AUTO-TEST markers — the test count is pasted by machinery,
# never transcribed by hand (the 573-vs-574 lesson).
#
# Usage: tools/round_close.sh            # run suite, splice summary
#        tools/round_close.sh <logfile>  # splice from an existing log
set -o pipefail
cd "$(dirname "$0")/.."
LOG="${1:-/tmp/round_close_test.log}"
if [ -z "$1" ]; then
  sbt -batch test 2>&1 | tee "$LOG"
  SBT_RC=$?
else
  SBT_RC=0
fi
python3 - "$LOG" <<'EOF'
import re, sys
log = open(sys.argv[1], errors="replace").read()
# the verbatim ScalaTest summary block: the last occurrence wins
pat = re.compile(
    r"^\[info\] (Run completed in .*|Total number of tests run: .*|"
    r"Suites: .*|Tests: .*|All tests passed\.|\*\*\* \d+ TESTS? FAILED"
    r" \*\*\*)$", re.M)
lines = pat.findall(log)
if not lines:
    sys.exit("no ScalaTest summary found in log — did the suite run?")
block_body = "\n".join("    " + l for l in lines[-6:])
# stamp the worktree state the gate ran against, so a block captured
# before later commits is SELF-EVIDENTLY stale (round-13 What's-wrong
# #4: the pasted 583/74 summary predated two commits) — re-run this
# script after the round's final commit and the stamp proves currency
import subprocess
try:
    head = subprocess.check_output(
        ["git", "log", "-1", "--format=%h %cI"], text=True).strip()
    dirty = subprocess.check_output(
        ["git", "status", "--porcelain"], text=True).strip()
    stamp = f"at commit {head}" + (" + uncommitted changes" if dirty else "")
except Exception:
    stamp = "git state unavailable"
BEGIN, END = "<!-- AUTO-TEST BEGIN -->", "<!-- AUTO-TEST END -->"
block = (f"{BEGIN}\n### Round-close test gate — verbatim ScalaTest "
         f"summary (auto-pasted by tools/round_close.sh, {stamp})\n\n"
         f"{block_body}\n{END}")
perf = open("PERF.md").read()
i = perf.find(BEGIN)
if i >= 0:
    j = perf.find(END, i)
    assert j >= 0, "unterminated AUTO-TEST block"
    perf = perf[:i] + block + perf[j + len(END):]
else:
    perf = perf.rstrip("\n") + "\n\n" + block + "\n"
open("PERF.md", "w").write(perf)
print("spliced verbatim summary into PERF.md:")
print(block_body)
EOF
exit $SBT_RC
