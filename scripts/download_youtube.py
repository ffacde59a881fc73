#!/usr/bin/env python
"""MSVD YouTube audio fetch (reference src/download_youtube.py:9-47).

For each ``videos/<YoutubeID>_<Start>_<End>.avi``, downloads the best audio
track, exports wav at 16 kHz, and trims to [Start, End] seconds into
``audios/<name>.wav`` — the sidecar layout the extractor reads.

Requires network access + yt-dlp (or youtube_dl) + ffmpeg; this container has
none of those, so the script gates cleanly and reports what is missing.

    python scripts/download_youtube.py --dataset datasets/MSVD
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", required=True)
    args = ap.parse_args()

    videos_dir = os.path.join(args.dataset, "videos")
    audios_dir = os.path.join(args.dataset, "audios")
    os.makedirs(audios_dir, exist_ok=True)

    ytdlp = shutil.which("yt-dlp") or shutil.which("youtube-dl")
    ffmpeg = os.environ.get("MVC_FFMPEG") or shutil.which("ffmpeg")
    if not ytdlp or not ffmpeg:
        missing = [n for n, p in (("yt-dlp/youtube-dl", ytdlp), ("ffmpeg", ffmpeg)) if not p]
        sys.exit(f"missing required tools: {', '.join(missing)} — install them and re-run")

    failures = []
    for f in sorted(os.listdir(videos_dir)):
        name, _ = os.path.splitext(f)
        parts = name.split("_")
        youtube_id = "_".join(parts[:-2])
        start, end = int(parts[-2]), int(parts[-1])
        out_wav = os.path.join(audios_dir, f"{name}.wav")
        if os.path.isfile(out_wav):
            continue
        tmp = os.path.join(audios_dir, f"{name}.full.wav")
        try:
            subprocess.run(
                [ytdlp, "-f", "bestaudio", "-x", "--audio-format", "wav",
                 "-o", tmp, f"https://www.youtube.com/watch?v={youtube_id}"],
                check=True, capture_output=True,
            )
            subprocess.run(
                [ffmpeg, "-v", "error", "-i", tmp, "-ss", str(start), "-to", str(end),
                 "-ac", "1", "-ar", "16000", out_wav],
                check=True, capture_output=True,
            )
        except subprocess.CalledProcessError as e:
            failures.append(name)
            print(f"FAILED {name}: {e}")
        finally:
            if os.path.isfile(tmp):
                os.unlink(tmp)
    print(f"done; {len(failures)} failures: {failures[:20]}")


if __name__ == "__main__":
    main()
