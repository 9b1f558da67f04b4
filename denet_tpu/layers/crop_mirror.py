"""On-graph random crop + mirror/flip layer (`CM` desc token).

Reference: denet/layer/crop_mirror.py — per-sample random crop offsets and
axis flips via advanced indexing; deterministic center crop at test time.
The gather-based indexing maps to a single XLA gather on TPU.
"""
import jax
import jax.numpy as jnp

from denet_tpu.layers.base import Layer


class CropMirrorLayer(Layer):
    type_name = "crop-mirror"

    def __init__(self, layers, crop_size=None, mirror_pr=0.0, flip_pr=0.0,
                 json_param=None):
        super().__init__(layers)
        json_param = json_param or {}
        self.crop_size = tuple(json_param.get("crop", crop_size))
        self.mirror_pr = json_param.get("mirror", mirror_pr)
        self.flip_pr = json_param.get("flip", flip_pr)
        self.output_shape = (self.input_shape[0], self.input_shape[1],
                             self.crop_size[0], self.crop_size[1])

    def apply(self, params, state, outputs, ctx):
        x = outputs[self.input_index]
        b, c = self.input_shape[0], self.input_shape[1]
        index_x = jnp.arange(self.crop_size[0])[None, :]
        index_y = jnp.arange(self.crop_size[1])[None, :]

        if ctx.train:
            key = ctx.layer_rng(self.layer_index)
            k_mirror, k_flip, k_ox, k_oy = jax.random.split(key, 4)
            # mirror reverses the last (y) axis, flip the x axis — matching
            # the reference's index arithmetic (crop_mirror.py:32-41)
            if self.mirror_pr > 0.0:
                mirror = jax.random.uniform(k_mirror, (b,)) > 1.0 - self.mirror_pr
                index_y = jnp.where(mirror[:, None],
                                    -index_y + self.crop_size[1] - 1, index_y)
            if self.flip_pr > 0.0:
                flip = jax.random.uniform(k_flip, (b,)) > 1.0 - self.flip_pr
                index_x = jnp.where(flip[:, None],
                                    -index_x + self.crop_size[0] - 1, index_x)

        dx = self.input_shape[2] - self.crop_size[0]
        dy = self.input_shape[3] - self.crop_size[1]
        if (dx, dy) != (0, 0):
            if ctx.train:
                offset_x = jax.random.randint(k_ox, (b,), 0, dx + 1)
                offset_y = jax.random.randint(k_oy, (b,), 0, dy + 1)
            else:
                offset_x = jnp.full((b,), dx // 2, dtype=jnp.int32)
                offset_y = jnp.full((b,), dy // 2, dtype=jnp.int32)
            index_x = index_x + offset_x[:, None]
            index_y = index_y + offset_y[:, None]

        index_b = jnp.arange(b)
        index_c = jnp.arange(c)
        y = x[index_b[:, None, None, None], index_c[None, :, None, None],
              index_x[:, None, :, None], index_y[:, None, None, :]]
        return y, {}

    @staticmethod
    def parse_desc(layers, name, tags, params):
        if name != "CM":
            return False
        crop_size = (params.get(0), params.get(0))
        layers.append(CropMirrorLayer(layers, crop_size, params.get(1, 0.0),
                                      params.get(2, 0.0)))
        return True

    def export_json(self, params, state):
        j = super().export_json(params, state)
        j.update({"crop": list(self.crop_size), "mirror": self.mirror_pr,
                  "flip": self.flip_pr})
        return j
