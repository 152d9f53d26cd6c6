"""Reference-LIBRARY harnesses (run-only use of /root/reference).

The CLI can't exercise everything: acm_seek_pcm's post-seek semantics
(persistent amp table, wrapbuf zeroing) only show through the library API.
This builds tiny C drivers against the reference sources so tests and the
fuzzer can byte-diff those paths too.
"""

import pathlib
import shutil
import subprocess

SEEKREAD_C = r"""
/* Seek-path harness: decode `pre` bytes, acm_seek_pcm(target), decode all
   remaining, write PCM to stdout. */
#include <stdio.h>
#include <stdlib.h>
#include "libacm.h"

int main(int argc, char **argv) {
    ACMStream *acm;
    int pre = atoi(argv[2]);
    long target = atol(argv[3]);
    static char buf[1 << 16];
    (void)argc;
    if (acm_open_file(&acm, argv[1], 0) < 0) return 2;
    while (pre > 0) {
        int want = pre < (int)sizeof(buf) ? pre : (int)sizeof(buf);
        int n = acm_read_loop(acm, buf, want, 0, 2, 1);
        if (n <= 0) break;
        pre -= n;
    }
    acm_seek_pcm(acm, target);
    for (;;) {
        int n = acm_read_loop(acm, buf, sizeof(buf), 0, 2, 1);
        if (n <= 0) break;
        fwrite(buf, 1, n, stdout);
    }
    acm_close(acm);
    return 0;
}
"""


def find_ref_src() -> str | None:
    for cand in ("/tmp/refsrc/src", "/root/reference/src"):
        if pathlib.Path(cand, "decode.c").exists():
            return cand
    return None


def build_seekread(out_dir: str | pathlib.Path) -> str | None:
    """Compile the seek harness; returns the executable path or None."""
    refsrc = find_ref_src()
    if refsrc is None or shutil.which("gcc") is None:
        return None
    d = pathlib.Path(out_dir)
    d.mkdir(parents=True, exist_ok=True)
    exe = d / "seekread"
    if exe.exists():
        return str(exe)
    src = d / "seekread.c"
    src.write_text(SEEKREAD_C)
    r = subprocess.run(
        ["gcc", "-O2", "-o", str(exe), "-I", refsrc,
         f"{refsrc}/decode.c", f"{refsrc}/util.c", str(src)],
        capture_output=True)
    return str(exe) if r.returncode == 0 else None
