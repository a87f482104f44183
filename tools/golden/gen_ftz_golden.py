#!/usr/bin/env python3
"""Independent golden-fixture generator for the quantized fastText
`.ftz` layout (GoldenFixturesSpec's ftz fixture) — authored
field-by-field from the PUBLIC fastText save format (matrix.cc /
quantmatrix.cc / productquantizer.cc / dictionary.cc save order),
deliberately NOT using graft's FastTextBin.write/writeQuantized, so a
shared writer/reader misreading of the wire format fails the spec.

Layout emitted:
  magic, version, args(dim ws epoch minCount neg wordNgrams loss model
  bucket minn maxn lrUpdateRate, t f64),
  dict(size nwords nlabels, ntokens i64, pruneidx_size i64, entries
  (cstring, count i64, type i8), prune pairs (i32,i32)*),
  quant_=1, QuantMatrix(qnorm=1, m i64, n i64, codesize i32, codes,
  PQ(dim nsubq dsub lastdsub, centroids dim*256 f32), normCodes m
  bytes, normPQ(1,1,1,1, 256 f32)),
  qout_=0, dense output (m i64, n i64, f32s).

Fixture: dim=3 (nsubq=2, dsub=2, lastdsub=1 -- exercises the uneven
last subquantizer), bucket=3 with buckets {1,2} kept and bucket 0
PRUNED (pruneidx (1->0, 2->1)), qnorm norms {1.0, 2.0, 0.5}.
"""
import struct

out = bytearray()
def i8(v): out.append(v & 0xff)
def i32(v): out.extend(struct.pack('<i', v))
def i64(v): out.extend(struct.pack('<q', v))
def f32(v): out.extend(struct.pack('<f', v))
def f64(v): out.extend(struct.pack('<d', v))
def cstr(s): out.extend(s.encode('utf-8')); out.append(0)

i32(793712314); i32(12)                      # magic, version
i32(3); i32(5); i32(5); i32(1); i32(5)       # dim ws epoch minCount neg
i32(2); i32(3); i32(3)                       # wordNgrams loss=softmax model=sup
i32(3); i32(0); i32(0); i32(100)             # bucket minn maxn lrUpdateRate
f64(1e-4)                                    # t
# dictionary: hej tja </s> + 2 labels; pruneidx keeps buckets 1,2
i32(5); i32(3); i32(2); i64(1000); i64(2)
for w in ["hej", "tja", "</s>"]:
    cstr(w); i64(100); i8(0)
for l in ["__label__sv", "__label__en"]:
    cstr(l); i64(100); i8(1)
i32(1); i32(0)                               # prune: bucket 1 -> row 0
i32(2); i32(1)                               # prune: bucket 2 -> row 1
# input: quantized, qnorm
i8(1)                                        # quant_
i8(1)                                        # qnorm
i64(5); i64(3)                               # m=3 words + 2 kept buckets, n=dim
i32(10)                                      # codesize = m * nsubq
# per-row (code_sub0, code_sub1): decoded rows (with norms below):
#  hej  (0,0) a=1.0 -> (1, 0, 0.5)
#  tja  (1,1) a=2.0 -> (0.5, 1.5, -2.0)
#  </s> (2,2) a=1.0 -> (0, 0, 0)
#  b1   (0,1) a=0.5 -> (0.5, 0, -0.5)
#  b2   (1,0) a=1.0 -> (0.25, 0.75, 0.5)
for c0, c1 in [(0, 0), (1, 1), (2, 2), (0, 1), (1, 0)]:
    i8(c0); i8(c1)
# data PQ: dim=3 nsubq=2 dsub=2 lastdsub=1; centroid table 3*256 f32
i32(3); i32(2); i32(2); i32(1)
sub0 = {0: (1.0, 0.0), 1: (0.25, 0.75), 2: (0.0, 0.0)}
for c in range(256):
    x, y = sub0.get(c, (0.0, 0.0)); f32(x); f32(y)
sub1 = {0: 0.5, 1: -1.0, 2: 0.0}
for c in range(256):
    f32(sub1.get(c, 0.0))
# norm codes + norm PQ (dim=1 nsubq=1 dsub=1 lastdsub=1)
for nc in [0, 1, 0, 2, 0]:
    i8(nc)
i32(1); i32(1); i32(1); i32(1)
norms = {0: 1.0, 1: 2.0, 2: 0.5}
for c in range(256):
    f32(norms.get(c, 0.0))
# output: dense 2x3, sv=(2,0,1) en=(0,2,-1)
i8(0); i64(2); i64(3)
for v in [2.0, 0.0, 1.0, 0.0, 2.0, -1.0]:
    f32(v)

h = out.hex()
print(f"// {len(out)} bytes")
for i in range(0, len(h), 88):
    print(f'      "{h[i:i+88]}",')
