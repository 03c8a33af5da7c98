"""Exact FLOP count for the SD v1.4 and SDXL UNets + VAE decoder.

Analytic count (2*MACs) over the real architectures, used to calibrate
bench.py's MFU/roofline lines (XLA's cost_analysis undercounts TPU
convs). SD v1.4 at 512x512 (64x64 latents); SDXL at 1024x1024 (128x128
latents, ctx 2048, transformer_layers_per_block (1,2,10) — models/
unet.py SDXL_UNET_CONFIG mirroring diffusers' SDXL config).
Run: python tools/flop_count.py
"""

from __future__ import annotations


CAT = {"conv": 0, "proj": 0, "attn": 0}


def conv(h, w, cin, cout, k=3):
    f = 2 * h * w * cin * cout * k * k
    CAT["conv"] += f
    return f


def lin(tokens, din, dout):
    f = 2 * tokens * din * dout
    CAT["proj"] += f
    return f


def attn(tokens, ctx, dmodel):
    # qkv/out projections counted separately via lin(); this is QK^T + PV
    f = 2 * 2 * tokens * ctx * dmodel
    CAT["attn"] += f
    return f


def resnet(h, w, cin, cout, temb=1280):
    f = conv(h, w, cin, cout) + conv(h, w, cout, cout)
    f += lin(1, temb, cout)
    if cin != cout:
        f += conv(h, w, cin, cout, k=1)
    return f


def transformer(h, w, c, ctx_len=77, ctx_dim=768):
    t = h * w
    f = conv(h, w, c, c, k=1) * 2            # proj_in / proj_out
    # self-attn: qkv + out projections + attention
    f += 4 * lin(t, c, c) + attn(t, t, c)
    # cross-attn: q from c, k/v from ctx_dim
    f += lin(t, c, c) * 2 + 2 * lin(ctx_len, ctx_dim, c) + attn(t, ctx_len, c)
    # geglu ff: c -> 8c (two halves), 4c -> c
    f += lin(t, c, 8 * c) + lin(t, 4 * c, c)
    return f


def sd14_unet(hw=64, ctx_dim=768):
    """Also counts SD 2.1 with hw=96, ctx_dim=1024 — same topology
    (channels, block layout); only the cross-attention K/V input width
    and the latent resolution differ."""
    chans = (320, 640, 1280, 1280)
    f = 0
    f += conv(hw, hw, 4, 320)                      # conv_in
    f += lin(1, 320, 1280) + lin(1, 1280, 1280)    # time embed
    res = hw
    cin = 320
    skips = []  # (res, channels) of each skip for the up path
    skips.append((res, 320))
    for i, c in enumerate(chans):
        for _ in range(2):
            f += resnet(res, res, cin, c)
            if i < 3:
                f += transformer(res, res, c, ctx_dim=ctx_dim)
            cin = c
            skips.append((res, c))
        if i < 3:
            f += conv(res // 2, res // 2, c, c)    # downsample stride 2
            res //= 2
            skips.append((res, c))
    # mid
    f += resnet(res, res, 1280, 1280) + transformer(res, res, 1280, ctx_dim=ctx_dim)
    f += resnet(res, res, 1280, 1280)
    # up path: 4 blocks x 3 resnets, reversed channels
    up_chans = (1280, 1280, 640, 320)
    cin = 1280
    for i, c in enumerate(up_chans):
        for _ in range(3):
            skip_res, skip_c = skips.pop()
            f += resnet(res, res, cin + skip_c, c)
            if i > 0:
                f += transformer(res, res, c, ctx_dim=ctx_dim)
            cin = c
        if i < 3:
            res *= 2
            f += conv(res, res, c, c)              # upsample conv
    f += conv(hw, hw, 320, 4)                      # conv_out
    return f


def transformer_n(h, w, c, n_layers, ctx_len=77, ctx_dim=2048):
    """SDXL-style Transformer2DModel: linear proj_in/out once, n_layers
    basic transformer layers (self + cross + geglu ff) inside."""
    t = h * w
    f = 2 * lin(t, c, c)                     # proj_in / proj_out (linear)
    for _ in range(n_layers):
        f += 4 * lin(t, c, c) + attn(t, t, c)
        f += 2 * lin(t, c, c) + 2 * lin(ctx_len, ctx_dim, c) + attn(
            t, ctx_len, c)
        f += lin(t, c, 8 * c) + lin(t, 4 * c, c)
    return f


def sdxl_unet(hw=128):
    """SDXL UNet at 1024x1024 (128x128 latents): blocks (320, 640, 1280),
    down types (plain, xattn x2 layers, xattn x10 layers), mid 10-layer
    transformer, mirrored up path with 3 resnets per block."""
    chans = (320, 640, 1280)
    tlayers = (0, 2, 10)                      # DownBlock2D has no attn
    f = conv(hw, hw, 4, 320)                  # conv_in
    f += lin(1, 320, 1280) + lin(1, 1280, 1280)    # time embed
    f += lin(1, 2816, 1280) + lin(1, 1280, 1280)   # add_embedding
    res, cin = hw, 320
    skips = [(res, 320)]
    for i, c in enumerate(chans):
        for _ in range(2):
            f += resnet(res, res, cin, c)
            if tlayers[i]:
                f += transformer_n(res, res, c, tlayers[i])
            cin = c
            skips.append((res, c))
        if i < 2:
            f += conv(res // 2, res // 2, c, c)    # downsample stride 2
            res //= 2
            skips.append((res, c))
    # mid: resnet + 10-layer transformer + resnet at 32x32
    f += resnet(res, res, 1280, 1280)
    f += transformer_n(res, res, 1280, 10)
    f += resnet(res, res, 1280, 1280)
    # up path: 3 blocks x 3 resnets, reversed channels/layers
    for i, (c, tl) in enumerate(zip((1280, 640, 320), (10, 2, 0))):
        for _ in range(3):
            skip_res, skip_c = skips.pop()
            f += resnet(res, res, cin + skip_c, c)
            if tl:
                f += transformer_n(res, res, c, tl)
            cin = c
        if i < 2:
            res *= 2
            f += conv(res, res, c, c)              # upsample conv
    f += conv(hw, hw, 320, 4)                      # conv_out
    return f


def vae_decoder(hw=64):
    # diffusers SD VAE decoder: conv_in 4->512, mid (2 resnets + attn),
    # 4 up blocks [512,512,512,256->...] wait: block_out_channels
    # (128,256,512,512) reversed -> 512,512,256,128, 3 resnets each,
    # upsample after first 3.
    f = conv(hw, hw, 4, 512)
    # mid at hw: 2 resnets + 1 single-head attention at c=512
    f += resnet(hw, hw, 512, 512, temb=0) * 2
    t = hw * hw
    f += 4 * lin(t, 512, 512) + attn(t, t, 512)
    res = hw
    cin = 512
    for i, c in enumerate((512, 512, 256, 128)):
        for _ in range(3):
            f += resnet(res, res, cin, c, temb=0)
            cin = c
        if i < 3:
            res *= 2
            f += conv(res, res, c, c)
    f += conv(res, res, 128, 3)
    return f


if __name__ == "__main__":
    u = sd14_unet()
    print("UNet category split:",
          {k: f"{x/1e9:.0f}G ({x/u:.0%})" for k, x in CAT.items()})
    for k in CAT:
        CAT[k] = 0
    v = vae_decoder()
    per_image = 50 * 2 * u + v
    print(f"UNet fwd @64x64 latent: {u/1e9:.1f} GFLOP")
    print(f"VAE decode @512x512:    {v/1e9:.1f} GFLOP")
    print(f"per image (50 steps, CFG): {per_image/1e12:.2f} TFLOP")
    for peak in (112.0,):
        print(f"speed of light @ {peak:.0f} TFLOP/s: "
              f"{peak*1e12/per_image:.2f} img/s")
    for k in CAT:
        CAT[k] = 0
    ux = sdxl_unet()
    print("\nSDXL UNet category split:",
          {k: f"{x/1e9:.0f}G ({x/ux:.0%})" for k, x in CAT.items()})
    for k in CAT:
        CAT[k] = 0
    vx = vae_decoder(hw=128)
    per_image_x = 50 * 2 * ux + vx
    print(f"SDXL UNet fwd @128x128 latent: {ux/1e9:.1f} GFLOP")
    print(f"VAE decode @1024x1024:         {vx/1e9:.1f} GFLOP")
    print(f"per image (50 steps, CFG): {per_image_x/1e12:.2f} TFLOP")
    for peak in (157.0,):
        print(f"speed of light @ {peak:.0f} TFLOP/s realized matmul rate: "
              f"{peak*1e12/per_image_x:.3f} img/s")
