"""SplitSequenceOnTheFly: stream a partition of the input to files/pipes
with {Uniq}/{FileNum}/{NumFiles}/{UniqFirst}/{UniqSecond} name templating
(ref: apps/SplitSequenceOnTheFly.cpp:60-670).

Partitions are byte ranges with pair-preserving record resync (identical
algorithm to ReadFileReader::seekToNextRecord), streamed as raw bytes so the
concatenation of all partitions reproduces the input exactly (the
runSplitSequenceOnTheFlyTests.sh invariant).  --split-file separates the
two reads of interleaved pairs into two outputs.
"""
from __future__ import annotations

import subprocess
import sys
from typing import List

from kmernator_tpu.io.reads import (open_maybe_gzip, extract_partition,
                                    parse_fastq_bytes, _split_name_line,
                                    read_num)
from kmernator_tpu.utils.options import GeneralOptions, compose


class _SSOptions:
    FLAGS = {"num-files": int, "file-num": int, "second-dim": int,
             "split-file": str, "pipe-command": str,
             "trim-pair-in-name": lambda v: str(v).lower() not in ("0", "false", "")}

    def __init__(self):
        self.num_files = 1
        self.file_num = 0
        self.second_dim = 0
        self.split_file = ""
        self.pipe_command = ""
        self.trim_pair_in_name = False


def replace_keys(s: str, file_num: int, num_files: int, second_dim: int) -> str:
    """ref: _SSOptions::_replaceWithKeys."""
    s = s.replace("{Uniq}", "%06dof%06d" % (file_num, num_files))
    s = s.replace("{FileNum}", "%06d" % file_num)
    s = s.replace("{NumFiles}", "%06d" % num_files)
    if second_dim > 0:
        first = file_num // second_dim
        second = file_num % second_dim
        first_dim = num_files // second_dim
        s = s.replace("{FirstNum}", "%06d" % first)
        s = s.replace("{SecondNum}", "%06d" % second)
        s = s.replace("{UniqFirst}", "%06dof%06d" % (first, first_dim))
        s = s.replace("{UniqSecond}", "%06dof%06d" % (second, second_dim))
    return s


def run(argv: List[str]) -> int:
    opts = GeneralOptions()
    sso = _SSOptions()
    argv = ["--output-file" if a == "--out" else a for a in argv]
    compose([opts, sso], argv, positional=["input-file"])

    fn, nf, sd = sso.file_num, sso.num_files, sso.second_dim
    parts = []
    for path in opts.input_file:
        data = open_maybe_gzip(path)
        parts.append(extract_partition(data, fn, nf))
    payload = b"".join(parts)

    if sso.split_file:
        # split interleaved pairs into two outputs (ref: OutputSplitFiles)
        out1 = open(replace_keys(opts.output_file, fn, nf, sd), "wb")
        out2 = open(replace_keys(sso.split_file, fn, nf, sd), "wb")
        recs = payload.split(b"\n")
        i = 0
        which = 0
        while i + 3 < len(recs):
            rec = b"\n".join(recs[i:i + 4]) + b"\n"
            nm, cm, _ = _split_name_line(recs[i][1:], True)
            rn = read_num(nm, cm)
            tgt = out2 if (rn == 2 or (rn == 0 and which == 1)) else out1
            if sso.trim_pair_in_name and rn:
                rec = rec.replace(nm, nm.rsplit(b"/", 1)[0], 1)
            tgt.write(rec)
            which ^= 1
            i += 4
        out1.close()
        out2.close()
    elif sso.pipe_command:
        cmd = replace_keys(sso.pipe_command, fn, nf, sd)
        proc = subprocess.Popen(cmd, shell=True, stdin=subprocess.PIPE)
        proc.stdin.write(payload)
        proc.stdin.close()
        proc.wait()
        return proc.returncode
    elif opts.output_file:
        with open(replace_keys(opts.output_file, fn, nf, sd), "wb") as f:
            f.write(payload)
    else:
        sys.stdout.buffer.write(payload)
    return 0


def main():
    sys.exit(run(sys.argv[1:]))


if __name__ == "__main__":
    main()
