"""TTS inference CLI (reference espnet2/bin/tts_inference.py analogue)."""
import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--exp_dir", required=True)
    p.add_argument("--text", required=True)
    p.add_argument("--out_wav", required=True)
    p.add_argument("--max_frames", type=int, default=500)
    p.add_argument("--vocoder_exp_dir", default=None,
                   help="trained hifigan/melgan/style_melgan exp dir "
                        "(replaces Griffin-Lim, --vocoder_file analogue)")
    args = p.parse_args(argv)
    from ..data.fileio import write_wav
    from ..tasks.tts import Text2Speech
    t2s = Text2Speech(args.exp_dir, vocoder_exp_dir=args.vocoder_exp_dir)
    mel, wav = t2s(args.text, max_frames=args.max_frames)
    if wav is not None:
        write_wav(args.out_wav, np.asarray(wav))
        print(f"wrote {args.out_wav} ({len(wav)} samples)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
