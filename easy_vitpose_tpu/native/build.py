"""Build the native host kernels: python -m easy_vitpose_tpu.native.build"""
import os
import subprocess
import sys

HERE = os.path.dirname(__file__)


def main():
    src = os.path.join(HERE, "nms.cpp")
    out = os.path.join(HERE, "libnms.so")
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", out]
    print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    print("built", out)


if __name__ == "__main__":
    sys.exit(main())
