"""Mix two speaker wavs into one track (reference `tools/synthesize_audio.py`)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--wavs", nargs="+", required=True)
    p.add_argument("--out", required=True)
    args = p.parse_args()

    from bindyouravatar_tpu.utils.media import merge_audio_files

    print(merge_audio_files(args.wavs, args.out))


if __name__ == "__main__":
    main()
