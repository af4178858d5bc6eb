#!/usr/bin/env bash
# Fetch the preprocessed S3DIS archive (same source the reference uses:
# reference script/download_s3dis.sh) into data/S3DIS/.
set -e
mkdir -p data/S3DIS
cd data/S3DIS
gdown https://drive.google.com/uc?id=1MX3ZCnwqyRztG1vFRiHkKTz68ZJeHS4Y
tar -xvf s3disfull.tar
