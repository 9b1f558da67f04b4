"""Model-desc presets for the standard DeNet configurations.

Desc strings follow the reference recipes verbatim where published:
examples/simple-cifar10.sh, examples/resnet34-imagenet.sh and the
papers/dss/denet34.sh / denet101.sh std|skip|wide variants (there the trunk
comes from a pretrained resnet .mdl.gz with SKIPSRC layers inserted by
model-modify; here the same composite graph is expressed directly in the
DSL so models can also be built from scratch).
"""

# examples/simple-cifar10.sh MODEL_DESC
SIMPLE_CIFAR10 = ("B[3] C[128,3] BN A C[96,2] BN A C[64,1] BN A P.A[2] D[0.2] "
                  "C[256,3] BN A C[192,2] BN A C[128,1] BN A P.A[2] D[0.2] "
                  "C[512,3] BN A C[384,2] BN A C[256,1] BN A D[0.2] "
                  "R.C[6]").split()

# examples/resnet34-imagenet.sh MODEL_DESC
RESNET34_IMAGENET = ("C.B[64,7,2] BN A P[3,2,1] nRSN.O[3,64,3] "
                     "nRSN.O[4,128,3,2] nRSN.O[6,256,3,2] nRSN.O[3,512,3,2] "
                     "P.A[7] R.TB").split()

# ResNet-101 (bottleneck 3-4-23-3)
RESNET101_IMAGENET = ("C.B[64,7,2] BN A P[3,2,1] nRSN.O[3,256,3,1,64] "
                      "nRSN.O[4,512,3,2,128] nRSN.O[23,1024,3,2,256] "
                      "nRSN.O[3,2048,3,2,512] P.A[7] R.TB").split()


def _resnet34_trunk(skip_variant=None):
    """ResNet-34 trunk with the SKIPSRC taps model-modify inserts in the
    reference recipes (papers/dss/denet34.sh: skip -> SKIPSRC.X after the
    128ch and 256ch stages; wide -> SKIPSRC after 64ch + SKIPSRC.X after
    128ch/256ch stages)."""
    t = ["C.B[64,7,2]", "BN", "A", "P[3,2,1]", "nRSN.O[3,64,3]"]
    if skip_variant == "wide":
        t.append("SKIPSRC[0]")
    t.append("nRSN.O[4,128,3,2]")
    if skip_variant == "skip":
        t.append("SKIPSRC.X[0]")
    elif skip_variant == "wide":
        t.append("SKIPSRC.X[1]")
    t.append("nRSN.O[6,256,3,2]")
    if skip_variant == "skip":
        t.append("SKIPSRC.X[1]")
    elif skip_variant == "wide":
        t.append("SKIPSRC.X[2]")
    t.append("nRSN.O[3,512,3,2]")
    return t


def _resnet101_trunk(skip_variant=None):
    t = ["C.B[64,7,2]", "BN", "A", "P[3,2,1]", "nRSN.O[3,256,3,1,64]"]
    if skip_variant == "wide":
        t.append("SKIPSRC[0]")
    t.append("nRSN.O[4,512,3,2,128]")
    if skip_variant == "skip":
        t.append("SKIPSRC.X[0]")
    elif skip_variant == "wide":
        t.append("SKIPSRC.X[1]")
    t.append("nRSN.O[23,1024,3,2,256]")
    if skip_variant == "skip":
        t.append("SKIPSRC.X[1]")
    elif skip_variant == "wide":
        t.append("SKIPSRC.X[2]")
    t.append("nRSN.O[3,2048,3,2,512]")
    return t


def _denet_head(variant="std", v2=False):
    """Detection head descs from papers/dss/denet34.sh MODEL_DESC.

    v2 ("c1", fitness-NMS paper) wide models sample 24x24=576 RoIs, not
    the v1 48x48=2304: corner clustering concentrates candidates so 1/4
    the RoIs suffice.  Reference evidence (README.md:118-148): DeNet34
    wide v2 runs 80 Hz ~= skip v1's 82 Hz (576 RoIs) vs wide v1's 44 Hz
    (2304 RoIs) on the same GPU — impossible at equal RoI count since
    clustering only ADDS host work — and the x768 recipe sets
    sample_num=36 = 24*(768/512), the same RoI density scaled to 768px
    ("1296 sample RoIs", README.md:135,145)."""
    dnd = "DND.JB[0.5,1,1]" if v2 else "DND[0.5,1,1]"
    dns_v2 = ",2,0.7" if v2 else ""  # local-max 2 + corner clustering 0.7
    if variant == "std":
        return ("PI[2] C.B[256,3] BNA PI[2] C.B[128,3] BNA DNC[96,100] "
                "DNS[7,24,0.01,0.1%s] C.B[1536,1] BNA C.B[1024,1] BNA "
                "C.B[768,1] BNA C.B[512,1] BNA %s" % (dns_v2, dnd)).split()
    if variant == "skip":
        return ("PI[2] C[256,3] SKIP[1] BNA PI[2] C[128,3] SKIP[0] BNA "
                "DNC[96,100] DNS[7,24,0.01,0.1%s] C[1536,1] BNA C.B[1024,1] "
                "BNA C.B[768,1] BNA C.B[512,1] BNA %s" % (dns_v2, dnd)).split()
    if variant == "wide":
        wide_sn = 24 if v2 else 48
        return ("PI[2] C[256,3] SKIP[2] BNA PI[2] C[128,3] SKIP[1] BNA PI[2] "
                "C[64,3] SKIP[0] BNA SPLIT DNC[48,400] DNS[10,%d,0.01,0.1%s] "
                "C.B[1536,1] BNA C.B[1024,1] BNA C.B[768,1] BNA C.B[512,1] "
                "BNA %s" % (wide_sn, dns_v2, dnd)).split()
    raise Exception("Unknown DeNet variant: %s" % variant)


def denet34(variant="skip", v2=False):
    """DeNet-34 detection model desc (std / skip / wide)."""
    skip_variant = variant if variant in ("skip", "wide") else None
    return _resnet34_trunk(skip_variant) + _denet_head(variant, v2)


def denet101(variant="skip", v2=False):
    """DeNet-101 detection model desc (std / skip / wide)."""
    skip_variant = variant if variant in ("skip", "wide") else None
    return _resnet101_trunk(skip_variant) + _denet_head(variant, v2)
