// Container/codec decode via the system FFmpeg libraries (m4a/AAC, ogg, ...).
//
// Reference behavior: the reference accepts .m4a uploads
// (audio_search.py:776) and decodes them through librosa.load
// (audio_search.py:233) -> audioread -> the *system's* ffmpeg/gstreamer.
// This is the same capability with one fewer layer: libavformat demux +
// libavcodec decode, driven directly over an in-memory buffer (no
// subprocess, no temp files on the decode path).
//
// Exposed C ABI (ctypes in audio/ffdecode.py):
//   mas_ff_decode       in-memory container -> malloc'd float32 interleaved
//   mas_ff_free         release the decode buffer
//   mas_ff_encode_file  PCM -> encoded file on disk (test-vector generation
//                       only; the mp4 muxer needs a seekable sink)
//
// Anything libavformat can demux and libavcodec can decode works; the
// framework registers m4a and ogg sniffers onto this path (audio/decode.py).

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/opt.h>
}

namespace {

struct MemCtx {
  const uint8_t* data;
  int64_t size;
  int64_t pos;
};

int mem_read(void* opaque, uint8_t* buf, int buf_size) {
  MemCtx* m = static_cast<MemCtx*>(opaque);
  int64_t left = m->size - m->pos;
  if (left <= 0) return AVERROR_EOF;
  int n = static_cast<int>(left < buf_size ? left : buf_size);
  memcpy(buf, m->data + m->pos, n);
  m->pos += n;
  return n;
}

int64_t mem_seek(void* opaque, int64_t offset, int whence) {
  MemCtx* m = static_cast<MemCtx*>(opaque);
  if (whence == AVSEEK_SIZE) return m->size;
  whence &= ~AVSEEK_FORCE;
  int64_t pos = whence == SEEK_SET   ? offset
                : whence == SEEK_CUR ? m->pos + offset
                : whence == SEEK_END ? m->size + offset
                                     : -1;
  if (pos < 0 || pos > m->size) return -1;
  m->pos = pos;
  return pos;
}

// Append one decoded AVFrame as interleaved float32.
bool append_frame(const AVFrame* fr, int channels,
                  std::vector<float>* out) {
  // A mid-stream channel-layout change (AAC PCE, chained ogg) yields
  // frames whose channel count differs from the codec context's;
  // indexing extended_data[] by the context count would then read
  // null/out-of-bounds plane pointers. Reject the frame instead.
  if (fr->ch_layout.nb_channels != channels) return false;
  const int n = fr->nb_samples;
  const AVSampleFormat fmt = static_cast<AVSampleFormat>(fr->format);
  const bool planar = av_sample_fmt_is_planar(fmt);
  const AVSampleFormat base = av_get_packed_sample_fmt(fmt);
  size_t at = out->size();
  out->resize(at + static_cast<size_t>(n) * channels);
  float* dst = out->data() + at;
  for (int c = 0; c < channels; ++c) {
    const uint8_t* src = planar ? fr->extended_data[c] : fr->extended_data[0];
    const int stride = planar ? 1 : channels;
    const int off = planar ? 0 : c;
    for (int i = 0; i < n; ++i) {
      double v;
      switch (base) {
        case AV_SAMPLE_FMT_FLT:
          v = reinterpret_cast<const float*>(src)[i * stride + off];
          break;
        case AV_SAMPLE_FMT_DBL:
          v = reinterpret_cast<const double*>(src)[i * stride + off];
          break;
        case AV_SAMPLE_FMT_S16:
          v = reinterpret_cast<const int16_t*>(src)[i * stride + off] /
              32768.0;
          break;
        case AV_SAMPLE_FMT_S32:
          v = reinterpret_cast<const int32_t*>(src)[i * stride + off] /
              2147483648.0;
          break;
        case AV_SAMPLE_FMT_U8:
          v = (src[i * stride + off] - 128) / 128.0;
          break;
        default:
          return false;
      }
      dst[static_cast<size_t>(i) * channels + c] = static_cast<float>(v);
    }
  }
  return true;
}

}  // namespace

extern "C" {

// data -> interleaved float32 (*out, malloc'd; frames x channels).
// Returns 0 on success, negative on failure.
int mas_ff_decode(const uint8_t* data, int64_t len, float** out,
                  int64_t* out_frames, int32_t* channels, int32_t* rate) {
  *out = nullptr;
  *out_frames = 0;
  av_log_set_level(AV_LOG_QUIET);

  MemCtx mem{data, len, 0};
  unsigned char* iobuf = static_cast<unsigned char*>(av_malloc(1 << 16));
  if (!iobuf) return -1;
  AVIOContext* avio = avio_alloc_context(iobuf, 1 << 16, 0, &mem, mem_read,
                                         nullptr, mem_seek);
  if (!avio) {
    av_free(iobuf);
    return -1;
  }
  AVFormatContext* fmt = avformat_alloc_context();
  if (!fmt) {
    avio_context_free(&avio);
    return -1;
  }
  fmt->pb = avio;

  int rc = -2;
  AVCodecContext* dec = nullptr;
  AVPacket* pkt = nullptr;
  AVFrame* fr = nullptr;
  std::vector<float> pcm;
  int nch = 0;

  do {
    if (avformat_open_input(&fmt, nullptr, nullptr, nullptr) < 0) {
      // open_input frees fmt on failure; avio freed below
      fmt = nullptr;
      break;
    }
    if (avformat_find_stream_info(fmt, nullptr) < 0) break;
    const AVCodec* codec = nullptr;
    int sidx = av_find_best_stream(fmt, AVMEDIA_TYPE_AUDIO, -1, -1, &codec,
                                   0);
    if (sidx < 0 || !codec) break;
    AVStream* st = fmt->streams[sidx];
    dec = avcodec_alloc_context3(codec);
    if (!dec) break;
    if (avcodec_parameters_to_context(dec, st->codecpar) < 0) break;
    if (avcodec_open2(dec, codec, nullptr) < 0) break;
    nch = dec->ch_layout.nb_channels;
    if (nch <= 0 || nch > 32) break;
    *channels = nch;
    *rate = dec->sample_rate;
    if (dec->sample_rate <= 0) break;

    pkt = av_packet_alloc();
    fr = av_frame_alloc();
    if (!pkt || !fr) break;

    bool bad = false;
    auto drain = [&](void) {
      int r;
      while ((r = avcodec_receive_frame(dec, fr)) == 0) {
        if (!append_frame(fr, nch, &pcm)) {
          // mid-stream layout change (chained Ogg, AAC PCE): stop
          // reading and keep the cleanly decoded prefix instead of
          // failing the whole upload (audioread-tolerance contract)
          bad = true;
          return;
        }
      }
      if (r != AVERROR(EAGAIN) && r != AVERROR_EOF) bad = true;
    };
    while (av_read_frame(fmt, pkt) >= 0 && !bad) {
      if (pkt->stream_index == sidx) {
        if (avcodec_send_packet(dec, pkt) == 0) drain();
        // undecodable packets are skipped (matches audioread tolerance)
      }
      av_packet_unref(pkt);
    }
    if (!bad) {
      avcodec_send_packet(dec, nullptr);  // flush
      drain();
    }
    if (pcm.empty()) break;

    float* buf = static_cast<float*>(malloc(pcm.size() * sizeof(float)));
    if (!buf) break;
    memcpy(buf, pcm.data(), pcm.size() * sizeof(float));
    *out = buf;
    *out_frames = static_cast<int64_t>(pcm.size()) / nch;
    rc = 0;
  } while (false);

  if (fr) av_frame_free(&fr);
  if (pkt) av_packet_free(&pkt);
  if (dec) avcodec_free_context(&dec);
  if (fmt) avformat_close_input(&fmt);
  if (avio) {
    av_free(avio->buffer);
    avio_context_free(&avio);
  }
  return rc;
}

void mas_ff_free(float* p) { free(p); }

// Encode mono float PCM to `path` (container from the extension; AAC for
// .m4a). Test-vector generation only. Returns 0 on success.
int mas_ff_encode_file(const float* pcm, int64_t n, int32_t rate,
                       const char* path) {
  av_log_set_level(AV_LOG_QUIET);
  AVFormatContext* fmt = nullptr;
  if (avformat_alloc_output_context2(&fmt, nullptr, nullptr, path) < 0 ||
      !fmt)
    return -1;

  int rc = -2;
  AVCodecContext* enc = nullptr;
  AVPacket* pkt = nullptr;
  AVFrame* fr = nullptr;
  bool io_open = false;

  do {
    const AVCodec* codec =
        avcodec_find_encoder(fmt->oformat->audio_codec);
    if (!codec) break;
    AVStream* st = avformat_new_stream(fmt, nullptr);
    if (!st) break;
    enc = avcodec_alloc_context3(codec);
    if (!enc) break;
    enc->sample_rate = rate;
    av_channel_layout_default(&enc->ch_layout, 1);
    enc->sample_fmt = codec->sample_fmts ? codec->sample_fmts[0]
                                         : AV_SAMPLE_FMT_FLTP;
    enc->bit_rate = 96000;
    enc->time_base = AVRational{1, rate};
    if (fmt->oformat->flags & AVFMT_GLOBALHEADER)
      enc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    if (avcodec_open2(enc, codec, nullptr) < 0) break;
    if (avcodec_parameters_from_context(st->codecpar, enc) < 0) break;
    st->time_base = enc->time_base;
    if (!(fmt->oformat->flags & AVFMT_NOFILE)) {
      if (avio_open(&fmt->pb, path, AVIO_FLAG_WRITE) < 0) break;
      io_open = true;
    }
    if (avformat_write_header(fmt, nullptr) < 0) break;

    pkt = av_packet_alloc();
    fr = av_frame_alloc();
    if (!pkt || !fr) break;
    const int step = enc->frame_size > 0 ? enc->frame_size : 1024;
    bool bad = false;
    auto pump = [&](void) {
      int r;
      while ((r = avcodec_receive_packet(enc, pkt)) == 0) {
        av_packet_rescale_ts(pkt, enc->time_base, st->time_base);
        pkt->stream_index = st->index;
        if (av_interleaved_write_frame(fmt, pkt) < 0) {
          bad = true;
          return;
        }
      }
      if (r != AVERROR(EAGAIN) && r != AVERROR_EOF) bad = true;
    };
    int64_t t = 0;
    for (int64_t at = 0; at < n && !bad; at += step) {
      const int len = static_cast<int>(at + step <= n ? step : n - at);
      fr->nb_samples = len;
      fr->format = enc->sample_fmt;
      av_channel_layout_copy(&fr->ch_layout, &enc->ch_layout);
      if (av_frame_get_buffer(fr, 0) < 0) {
        bad = true;
        break;
      }
      if (enc->sample_fmt == AV_SAMPLE_FMT_FLTP ||
          enc->sample_fmt == AV_SAMPLE_FMT_FLT) {
        memcpy(fr->extended_data[0], pcm + at, len * sizeof(float));
      } else if (enc->sample_fmt == AV_SAMPLE_FMT_S16 ||
                 enc->sample_fmt == AV_SAMPLE_FMT_S16P) {
        int16_t* d = reinterpret_cast<int16_t*>(fr->extended_data[0]);
        for (int i = 0; i < len; ++i) {
          float v = pcm[at + i];
          v = v > 1.f ? 1.f : (v < -1.f ? -1.f : v);
          d[i] = static_cast<int16_t>(v * 32767.f);
        }
      } else {
        bad = true;
        break;
      }
      fr->pts = t;
      t += len;
      if (avcodec_send_frame(enc, fr) < 0) bad = true;
      av_frame_unref(fr);
      if (!bad) pump();
    }
    if (bad) break;
    avcodec_send_frame(enc, nullptr);
    pump();
    if (bad) break;
    if (av_write_trailer(fmt) < 0) break;
    rc = 0;
  } while (false);

  if (fr) av_frame_free(&fr);
  if (pkt) av_packet_free(&pkt);
  if (enc) avcodec_free_context(&enc);
  if (io_open) avio_closep(&fmt->pb);
  avformat_free_context(fmt);
  return rc;
}

}  // extern "C"
