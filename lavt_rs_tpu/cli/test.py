"""Evaluation entry point — the reference test.py equivalent.

Evaluates every sentence of every ref object and prints mIoU / oIoU / P@K
(reference test.py:53-109 loop + 100-109 summary).

Use --synthetic for a data-free smoke run.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def get_parser():
    from .args import (add_data_args, add_eval_args, add_model_args,
                       add_train_args)

    p = argparse.ArgumentParser("lavt_rs_tpu evaluation")
    add_model_args(p)
    add_data_args(p)
    add_train_args(p)  # --resume / --ckpt / loss flags, reference-style
    add_eval_args(p)
    p.add_argument("--checkpoint", default="",
                   help="orbax dir (ours) or torch .pth (converted); "
                        "--resume is the reference-compatible alias")
    p.add_argument("--max_items", type=int, default=0)
    p.add_argument("--save_vis", default="",
                   help="directory for mask-overlay PNG dumps (alias of "
                        "the reference's --a2d_masks behavior)")
    p.set_defaults(split="val")
    return p


def main(argv=None):
    args = get_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..eval.refcoco_eval import evaluate
    from ..models.factory import build_model

    from .args import model_config_from_args

    cfg = model_config_from_args(args)
    if not args.checkpoint and args.resume:
        args.checkpoint = args.resume
    model = build_model(cfg)

    if args.dataset == "a2d":
        return _eval_a2d(args, cfg, model)

    if args.synthetic:
        # tiny random model + synthetic 4-ref dataset for a smoke run
        import dataclasses

        from lavt_rs_tpu.config import SwinConfig

        cfg = cfg.replace(
            swin=SwinConfig(embed_dim=48, depths=(1, 1, 2, 1),
                            num_heads=(3, 6, 12, 24), window_size=7),
            bert=dataclasses.replace(cfg.bert, num_layers=2),
            img_size=64, max_tokens=8)
        model = build_model(cfg)
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
            jnp.ones((1, 8), jnp.int32), jnp.ones((1, 8), jnp.int32))

        class FakeDS:
            def __len__(self):
                return 4

            def __getitem__(self, i):
                rng = np.random.default_rng(i)
                from ..data.refcoco import ReferExample

                s = 1 + i % 3
                return ReferExample(
                    image=rng.standard_normal((64, 64, 3)).astype(np.float32),
                    target=rng.integers(0, 2, (64, 64)).astype(np.int32),
                    ids=rng.integers(0, 100, (s, 8)).astype(np.int32),
                    mask=np.ones((s, 8), np.int32), ref_id=i)

        ds = FakeDS()
    else:
        from ..data.refer import REFER
        from ..data.refcoco import ReferDataset
        from ..text.tokenizer import WordPieceTokenizer, resolve_vocab

        refer = REFER(args.refer_data_root, args.dataset, args.splitBy)
        tok = WordPieceTokenizer.from_vocab_file(
            resolve_vocab(args.vocab, args.bert_tokenizer))
        ds = ReferDataset(refer, tok, split=args.split,
                          img_size=args.img_size,
                          max_tokens=args.max_tokens, eval_mode=True,
                          host_normalize=False)  # normalize on device

        if args.checkpoint.endswith((".pth", ".pt")):
            variables = jax.tree.map(
                jnp.asarray, _convert_torch_checkpoint(args.checkpoint, cfg))
        elif args.checkpoint:
            from ..train.checkpoint import restore_checkpoint
            from ..train.optim import TrainConfig
            from ..train.step import create_train_state

            variables = jax.eval_shape(
                lambda: model.init(jax.random.PRNGKey(0),
                                   jnp.zeros((1, cfg.img_size, cfg.img_size,
                                              3)),
                                   jnp.ones((1, cfg.max_tokens), jnp.int32),
                                   jnp.ones((1, cfg.max_tokens), jnp.int32)))
            state, _ = create_train_state(
                model, jax.tree.map(
                    lambda s: jnp.zeros(s.shape, s.dtype), variables),
                TrainConfig())
            state, _, _ = restore_checkpoint(args.checkpoint, state)
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
        else:
            print("WARNING: no checkpoint; evaluating random weights",
                  file=sys.stderr)
            variables = jax.jit(model.init)(
                jax.random.PRNGKey(0),
                jnp.zeros((1, cfg.img_size, cfg.img_size, 3)),
                jnp.ones((1, cfg.max_tokens), jnp.int32),
                jnp.ones((1, cfg.max_tokens), jnp.int32))

    summary = evaluate(lambda v, *a: model.apply(v, *a), variables, ds,
                       max_items=args.max_items or None,
                       image_dtype=(jnp.bfloat16
                                    if cfg.dtype == "bfloat16" else None),
                       cast_bf16=cfg.dtype == "bfloat16")
    print(summary)

    if args.save_vis:
        import os

        from PIL import Image

        from ..data.transforms import IMAGENET_MEAN, IMAGENET_STD
        from ..ops.norm import maybe_normalize_image
        from ..utils.visualize import vis_add_mask

        os.makedirs(args.save_vis, exist_ok=True)
        fwd = jax.jit(lambda v, im, *a: model.apply(
            v, maybe_normalize_image(im), *a))
        n = min(len(ds), args.max_items or 16, 16)
        for i in range(n):
            ex = ds[i]
            ids = ex.ids if ex.ids.ndim == 2 else ex.ids[None]
            msk = ex.mask if ex.mask.ndim == 2 else ex.mask[None]
            logits = fwd(variables, jnp.asarray(ex.image[None]),
                         jnp.asarray(ids[:1].astype(np.int32)),
                         jnp.asarray(msk[:1].astype(np.int32)))
            pred = np.asarray(logits)[0].argmax(-1).astype(np.uint8)
            img = (ex.image if ex.image.dtype == np.uint8 else
                   ((ex.image * IMAGENET_STD + IMAGENET_MEAN) * 255
                    ).clip(0, 255).astype(np.uint8))
            Image.fromarray(vis_add_mask(img, pred, 0)).save(
                os.path.join(args.save_vis, f"{i:05d}_pred.png"))
            Image.fromarray(vis_add_mask(img, ex.target > 0, 1)).save(
                os.path.join(args.save_vis, f"{i:05d}_gt.png"))
        print(f"saved overlays to {args.save_vis}", file=sys.stderr)

    if args.save_feats:
        import os

        from ..data.transforms import normalize as _host_norm
        from ..eval.features import forward_with_features

        os.makedirs(args.save_feats, exist_ok=True)
        n = min(len(ds), args.max_items or 8, 8)
        for i in range(n):
            ex = ds[i]
            ids = ex.ids if ex.ids.ndim == 2 else ex.ids[None]
            msk = ex.mask if ex.mask.ndim == 2 else ex.mask[None]
            image = (_host_norm(ex.image)
                     if ex.image.dtype == np.uint8 else ex.image)
            _, feats = forward_with_features(
                model, variables, jnp.asarray(image[None]),
                jnp.asarray(ids[:1].astype(np.int32)),
                jnp.asarray(msk[:1].astype(np.int32)))
            flat = {}

            def _walk(node, path):
                if isinstance(node, dict):
                    for k, v in node.items():
                        _walk(v, path + (k,))
                else:
                    leaves = node if isinstance(node, (tuple, list)) else [node]
                    for j, leaf in enumerate(leaves):
                        flat["/".join(path + (str(j),))] = np.asarray(leaf)

            _walk(feats, ())
            np.savez_compressed(
                os.path.join(args.save_feats, f"{i:05d}_feats.npz"), **flat)
        print(f"saved decoder features to {args.save_feats}", file=sys.stderr)


def _convert_torch_checkpoint(path: str, cfg):
    """Convert a reference .pth checkpoint, dispatching the converter on the
    model family (the reference's test.py builds the model by --model name
    and loads the state dict directly, test.py:273-278)."""
    from ..convert import torch2jax as t2j

    if cfg.name == "lavt":
        # two-model checkpoint: {'model': ..., 'bert_model': ...}
        return t2j.convert_lavt_two_file(path, cfg)
    sd = t2j.load_torch_state_dict(path)
    if cfg.name == "lts":
        return t2j.convert_lts(sd, cfg)
    if cfg.name in ("vlt", "lavt_vlt"):
        return t2j.convert_vlt(sd, cfg)
    if cfg.name == "lavt_video":
        return t2j.convert_lavt_video(sd, cfg)
    return t2j.convert_lavt_one(sd, cfg)


def _load_video_variables(args, cfg, model):
    import jax
    import jax.numpy as jnp

    if args.checkpoint.endswith((".pth", ".pt")):
        from ..convert.torch2jax import (convert_lavt_video,
                                         load_torch_state_dict)

        return jax.tree.map(
            jnp.asarray,
            convert_lavt_video(load_torch_state_dict(args.checkpoint), cfg))
    if args.checkpoint:
        from ..train.checkpoint import restore_checkpoint
        from ..train.optim import TrainConfig
        from ..train.step import create_train_state

        init_vars = jax.jit(model.init)(
            jax.random.PRNGKey(0),
            jnp.zeros((1, args.num_frames, cfg.img_size, cfg.img_size, 3)),
            jnp.ones((1, cfg.max_tokens), jnp.int32),
            jnp.ones((1, cfg.max_tokens), jnp.int32))
        state, _ = create_train_state(model, init_vars, TrainConfig())
        state, _, _ = restore_checkpoint(args.checkpoint, state)
        return {"params": state.params, "batch_stats": state.batch_stats}
    print("WARNING: no checkpoint; evaluating random weights",
          file=sys.stderr)
    return jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, args.num_frames, cfg.img_size, cfg.img_size, 3)),
        jnp.ones((1, cfg.max_tokens), jnp.int32),
        jnp.ones((1, cfg.max_tokens), jnp.int32))


def _eval_a2d(args, cfg, model):
    """A2D-Sentences evaluation (reference test.py:121-230): per clip,
    forward, score the annotated frame; optional --a2d_masks PNG dump.
    --synthetic runs the same loop on a tiny model + fake clips."""
    import jax

    from ..eval.video_eval import evaluate_a2d

    if args.synthetic:
        import dataclasses

        import jax.numpy as jnp

        from ..config import SwinConfig
        from ..data.a2d import VideoExample
        from ..models.factory import build_model

        cfg = cfg.replace(
            swin=SwinConfig(embed_dim=48, depths=(1, 1, 2, 1),
                            num_heads=(3, 6, 12, 24),
                            window_size_3d=(2, 7, 7)),
            bert=dataclasses.replace(cfg.bert, num_layers=2),
            img_size=64, max_tokens=8, num_frames=2)
        model = build_model(cfg)
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 2, 64, 64, 3)),
            jnp.ones((1, 8), jnp.int32), jnp.ones((1, 8), jnp.int32))

        class FakeA2D:
            def __len__(self):
                return 2

            def __getitem__(self, i):
                rng = np.random.default_rng(i)
                return VideoExample(
                    video=rng.standard_normal((2, 64, 64, 3)).astype(
                        np.float32),
                    target=rng.integers(0, 2, (64, 64)).astype(np.int32),
                    valid_index=i % 2, valid=1,
                    ids=rng.integers(0, 100, (8,)).astype(np.int32),
                    mask=np.ones((8,), np.int32),
                    image_id=f"synthetic_{i}")

        ds = FakeA2D()
    else:
        from ..data.a2d import A2DSentencesDataset
        from ..text.tokenizer import WordPieceTokenizer, resolve_vocab

        tok = WordPieceTokenizer.from_vocab_file(
            resolve_vocab(args.vocab, args.bert_tokenizer))
        ds = A2DSentencesDataset(
            args.a2d_data_root, args.a2d_ann, tok, subset=args.split,
            num_frames=args.num_frames, clip_length=args.clip_length,
            img_size=args.img_size, max_tokens=cfg.max_tokens,
            host_normalize=False, not_consecutive=args.not_consecutive)
        variables = _load_video_variables(args, cfg, model)
    summary = evaluate_a2d(lambda v, *a: model.apply(v, *a), variables, ds,
                           max_items=args.max_items or None)
    print(summary)

    if args.a2d_masks:
        import os

        from PIL import Image
        import jax.numpy as jnp

        from ..ops.norm import maybe_normalize_image

        out = os.path.join(args.output_dir or ".", "a2d_masks")
        os.makedirs(out, exist_ok=True)
        fwd = jax.jit(lambda v, im, *a: model.apply(
            v, maybe_normalize_image(im), *a))
        n = min(len(ds), args.max_items or 32)
        for i in range(n):
            ex = ds[i]
            logits = fwd(variables, jnp.asarray(ex.video[None]),
                         jnp.asarray(ex.ids[None].astype(np.int32)),
                         jnp.asarray(ex.mask[None].astype(np.int32)))
            pred = np.asarray(logits)[ex.valid_index].argmax(-1)
            Image.fromarray((pred * 255).astype(np.uint8)).save(
                os.path.join(out, f"{ex.image_id}.png"))
        print(f"saved {n} A2D masks to {out}", file=sys.stderr)
    return summary


if __name__ == "__main__":
    main()
