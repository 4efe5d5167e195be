# TPU-native macro-placement framework — Streamlit serving image.
# Mirrors the reference container surface (port 8501, streamlit CMD —
# /root/reference/Dockerfile) on top of a JAX-capable base. On real TPU
# hosts use a TPU-enabled base image and device mounts instead of the
# CPU jax wheel below.

FROM python:3.11-slim

ENV PYTHONUNBUFFERED=1 PIP_NO_CACHE_DIR=1

# Fonts for the contact-sheet labels + Pillow native codecs
RUN apt-get update && apt-get install -y --no-install-recommends \
    fonts-dejavu-core \
    libjpeg62-turbo \
    zlib1g \
    libpng16-16 \
    libfreetype6 \
    g++ make \
    ca-certificates \
 && rm -rf /var/lib/apt/lists/*

WORKDIR /app

COPY pyproject.toml requirements.txt ./
RUN pip install --no-cache-dir "jax[cpu]>=0.9" numpy pillow pytest streamlit

COPY . .
# Build the native IO helper (optional fast path; pure-Python fallback exists)
RUN make -C native || true

EXPOSE 8501

CMD ["streamlit", "run", "app.py", "--server.address=0.0.0.0", "--server.port=8501"]
