"""Minimal ncnn model parser + JAX executor.

The reference runs its sky-segmentation net with the ncnn inference engine
(SkySegment/src/SkyRegionDetect.cpp:620-640). Instead of binding ncnn, the
public .param/.bin formats are parsed here and the graph is executed as a
jittable JAX function — the 2.2 MB fp16 model
(segment_model/skysegsmall_sim-opt-fp16.{param,bin}) runs natively on TPU.

Supported layer types (the full set used by the sky model): Input,
Convolution (incl. dilation + ReLU/Sigmoid fusion), Split, Concat (axis 0 =
channels), Pooling (max), Interp (bilinear with explicit output size),
BinaryOp (add), Sigmoid.

ncnn format notes:
  * .param: magic 7767517; "layer_count blob_count"; then one line per
    layer: type, name, #in, #out, input blobs, output blobs, k=v params.
    Negative keys are arrays ("-233xx=count,v0,v1,...").
  * .bin: weights in layer order. A conv's weight blob is preceded by a
    4-byte tag (0 -> fp32, 0x01306B47 -> fp16 padded to 4-byte alignment,
    0x0002C056 -> raw fp32); the bias blob is always raw fp32.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np

TAG_FP32 = 0
TAG_FP16 = 0x01306B47
TAG_RAW = 0x0002C056


@dataclasses.dataclass
class NcnnLayer:
    type: str
    name: str
    inputs: List[str]
    outputs: List[str]
    params: Dict[int, object]
    weights: Dict[str, np.ndarray] = dataclasses.field(default_factory=dict)

    def p(self, key: int, default=0):
        return self.params.get(key, default)


def _parse_params(tokens: List[str]) -> Dict[int, object]:
    out: Dict[int, object] = {}
    for tok in tokens:
        k, v = tok.split("=", 1)
        k = int(k)
        if k < 0:  # array param
            vals = v.split(",")
            arr = [float(x) if "." in x or "e" in x else int(x)
                   for x in vals]
            out[-k - 23300] = arr[1:]  # first entry is the count
        else:
            out[k] = float(v) if ("." in v or "e" in v.lower()) else int(v)
    return out


class _BinReader:
    def __init__(self, blob: bytes):
        self.blob = blob
        self.pos = 0

    def read_tagged(self, count: int) -> np.ndarray:
        tag = int(np.frombuffer(self.blob, "<u4", 1, self.pos)[0])
        self.pos += 4
        if tag == TAG_FP16:
            data = np.frombuffer(self.blob, "<f2", count, self.pos)
            self.pos += (count * 2 + 3) // 4 * 4  # 4-byte aligned
            return data.astype(np.float32)
        if tag in (TAG_FP32, TAG_RAW):
            data = np.frombuffer(self.blob, "<f4", count, self.pos)
            self.pos += count * 4
            return data.astype(np.float32)
        raise ValueError(f"unsupported ncnn weight tag 0x{tag:08x}")

    def read_raw(self, count: int) -> np.ndarray:
        data = np.frombuffer(self.blob, "<f4", count, self.pos)
        self.pos += count * 4
        return data.astype(np.float32)


def load_ncnn(param_path: str, bin_path: str) -> List[NcnnLayer]:
    with open(param_path) as f:
        lines = [l.split() for l in f.read().splitlines() if l.strip()]
    magic = int(lines[0][0])
    if magic != 7767517:
        raise ValueError(f"bad ncnn magic {magic}")
    layer_count, _blob_count = int(lines[1][0]), int(lines[1][1])
    layers: List[NcnnLayer] = []
    for row in lines[2:2 + layer_count]:
        ltype, name, nin, nout = row[0], row[1], int(row[2]), int(row[3])
        ins = row[4:4 + nin]
        outs = row[4 + nin:4 + nin + nout]
        params = _parse_params(row[4 + nin + nout:])
        layers.append(NcnnLayer(ltype, name, ins, outs, params))

    reader = _BinReader(open(bin_path, "rb").read())
    for layer in layers:
        if layer.type == "Convolution":
            wsize = layer.p(6)
            layer.weights["weight"] = reader.read_tagged(wsize)
            if layer.p(5, 0):
                layer.weights["bias"] = reader.read_raw(layer.p(0))
    if reader.pos != len(reader.blob):
        raise ValueError(
            f"ncnn bin not fully consumed: {reader.pos}/{len(reader.blob)}")
    return layers


def save_npz(layers: List[NcnnLayer], path: str) -> None:
    """Serialize a parsed layer graph to one .npz (weights stored float16 —
    the source model is fp16, so this is lossless — plus a JSON graph).
    Lets the framework vendor converted weights instead of depending on the
    reference checkout at runtime."""
    import json

    meta = [{"type": l.type, "name": l.name, "inputs": l.inputs,
             "outputs": l.outputs,
             "params": {str(k): v for k, v in l.params.items()}}
            for l in layers]
    arrays = {"__graph__": np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)}
    for i, l in enumerate(layers):
        for wname, w in l.weights.items():
            # conv weights are fp16 in the source model (lossless to store as
            # such); biases are fp32 raw — keep full precision
            arrays[f"{i}.{wname}"] = (w.astype(np.float16)
                                      if wname == "weight" else w)
    np.savez_compressed(path, **arrays)


def load_npz(path: str) -> List[NcnnLayer]:
    """Inverse of :func:`save_npz`."""
    import json

    z = np.load(path)
    meta = json.loads(bytes(z["__graph__"]).decode())
    layers = []
    for i, m in enumerate(meta):
        layer = NcnnLayer(m["type"], m["name"], m["inputs"], m["outputs"],
                          {int(k): v for k, v in m["params"].items()})
        for key in z.files:
            if key.startswith(f"{i}."):
                layer.weights[key.split(".", 1)[1]] = z[key].astype(np.float32)
        layers.append(layer)
    return layers


def _conv(x, layer: NcnnLayer):
    """x: (C, H, W). ncnn weight layout (out, in, kh, kw)."""
    import jax
    import jax.numpy as jnp
    out_ch = layer.p(0)
    kw = layer.p(1)
    kh = layer.p(11, kw)
    dil = layer.p(2, 1)
    stride = layer.p(3, 1)
    pad_l = layer.p(4, 0)
    pad_t = layer.p(14, pad_l)
    pad_r = layer.p(15, pad_l)
    pad_b = layer.p(16, pad_t)
    in_ch = x.shape[0]
    w = layer.weights["weight"].reshape(out_ch, in_ch, kh, kw)
    y = jax.lax.conv_general_dilated(
        x[None], jnp.asarray(w),
        window_strides=(stride, layer.p(13, stride)),
        padding=((pad_t, pad_b), (pad_l, pad_r)),
        rhs_dilation=(dil, layer.p(12, dil)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[0]
    if "bias" in layer.weights:
        y = y + jnp.asarray(layer.weights["bias"])[:, None, None]
    act = layer.p(9, 0)
    if act == 1:
        y = jnp.maximum(y, 0.0)
    elif act == 4:
        y = jax.nn.sigmoid(y)
    elif act != 0:
        raise NotImplementedError(f"conv activation {act}")
    return y


def _interp_bilinear(x, out_h: int, out_w: int):
    """ncnn bilinear Interp (align_corners=False): (C, H, W) -> (C, oh, ow)."""
    import jax
    return jax.image.resize(x, (x.shape[0], out_h, out_w), method="linear")


def _maxpool(x, layer: NcnnLayer):
    import jax
    k = layer.p(1, 2)
    s = layer.p(2, k)
    return jax.lax.reduce_window(
        x, -np.inf, jax.lax.max, (1, k, k), (1, s, s), "VALID")


def make_executor(layers: List[NcnnLayer], input_blob: str, output_blob: str):
    """Build a jittable (C, H, W) -> output function executing the graph."""
    import jax
    import jax.numpy as jnp

    def forward(x):
        blobs = {input_blob: x}
        for layer in layers:
            if layer.type == "Input":
                continue
            ins = [blobs[b] for b in layer.inputs]
            if layer.type == "Convolution":
                out = [_conv(ins[0], layer)]
            elif layer.type == "Split":
                out = [ins[0]] * len(layer.outputs)
            elif layer.type == "Concat":
                axis = layer.p(0, 0)
                out = [jnp.concatenate(ins, axis=axis)]
            elif layer.type == "Pooling":
                if layer.p(0, 0) != 0:
                    raise NotImplementedError("only max pooling")
                out = [_maxpool(ins[0], layer)]
            elif layer.type == "Interp":
                oh, ow = layer.p(3), layer.p(4)
                if oh <= 0 or ow <= 0:
                    sh, sw = layer.p(1, 1.0), layer.p(2, 1.0)
                    oh = int(round(ins[0].shape[1] * float(sh)))
                    ow = int(round(ins[0].shape[2] * float(sw)))
                out = [_interp_bilinear(ins[0], oh, ow)]
            elif layer.type == "BinaryOp":
                op = layer.p(0, 0)
                if op == 0:
                    out = [ins[0] + ins[1]]
                elif op == 2:
                    out = [ins[0] * ins[1]]
                else:
                    raise NotImplementedError(f"BinaryOp {op}")
            elif layer.type == "Sigmoid":
                out = [jax.nn.sigmoid(ins[0])]
            else:
                raise NotImplementedError(f"ncnn layer {layer.type}")
            for name, val in zip(layer.outputs, out):
                blobs[name] = val
            if output_blob in blobs and layer.outputs == [output_blob]:
                break
        return blobs[output_blob]

    return forward
