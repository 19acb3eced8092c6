// Native video decode library for the clipbert_tpu host data plane.
//
// TPU-native replacement for the reference's PyAV/FFmpeg decode path
// (/root/reference/src/datasets/decoder.py:63-201): the Python layer plans
// WHICH frames to sample (clipbert_tpu/data/sampling.py) and this library
// decodes exactly those frame indices from an in-memory video blob,
// multi-threaded inside the codec and GIL-free at the call boundary
// (loaded via ctypes, see clipbert_tpu/data/video.py).
//
// Exported C ABI:
//   vdec_probe(data, size, *fps, *nframes, *width, *height) -> 0 on success
//   vdec_decode_indices(data, size, indices, n, out_rgb) -> 0 on success
//     out_rgb must hold n * height * width * 3 bytes (RGB24, frame order
//     matching `indices`, which must be sorted or not — any order works).
//   venc_make_test_video(path, w, h, n_frames, fps) -> 0  (test fixture
//     generator: encodes synthetic frames with per-frame grey markers)
//
// Build: make -C native   (links system libavformat/avcodec/avutil/swscale)

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libswscale/swscale.h>
}

#include <algorithm>
#include <cstring>
#include <set>
#include <vector>

namespace {

struct MemReader {
  const uint8_t* data;
  size_t size;
  size_t pos;
};

int mem_read(void* opaque, uint8_t* buf, int buf_size) {
  MemReader* r = static_cast<MemReader*>(opaque);
  size_t remaining = r->size - r->pos;
  if (remaining == 0) return AVERROR_EOF;
  size_t n = std::min(static_cast<size_t>(buf_size), remaining);
  memcpy(buf, r->data + r->pos, n);
  r->pos += n;
  return static_cast<int>(n);
}

int64_t mem_seek(void* opaque, int64_t offset, int whence) {
  MemReader* r = static_cast<MemReader*>(opaque);
  if (whence == AVSEEK_SIZE) return static_cast<int64_t>(r->size);
  size_t base = 0;
  if (whence == SEEK_CUR) base = r->pos;
  else if (whence == SEEK_END) base = r->size;
  int64_t target = static_cast<int64_t>(base) + offset;
  if (target < 0 || target > static_cast<int64_t>(r->size)) return -1;
  r->pos = static_cast<size_t>(target);
  return target;
}

// Opens an in-memory container + video decoder. Caller must call close().
struct Demux {
  MemReader reader{};
  AVIOContext* avio = nullptr;
  AVFormatContext* fmt = nullptr;
  AVCodecContext* codec = nullptr;
  int stream_idx = -1;

  int open(const uint8_t* data, size_t size) {
    reader = {data, size, 0};
    constexpr int kBufSize = 1 << 16;
    uint8_t* buf = static_cast<uint8_t*>(av_malloc(kBufSize));
    if (!buf) return -1;
    avio = avio_alloc_context(buf, kBufSize, 0, &reader, mem_read, nullptr,
                              mem_seek);
    if (!avio) { av_free(buf); return -1; }
    fmt = avformat_alloc_context();
    if (!fmt) return -1;
    fmt->pb = avio;
    if (avformat_open_input(&fmt, nullptr, nullptr, nullptr) < 0) return -1;
    if (avformat_find_stream_info(fmt, nullptr) < 0) return -1;
    stream_idx = av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1,
                                     nullptr, 0);
    if (stream_idx < 0) return -1;
    AVStream* st = fmt->streams[stream_idx];
    const AVCodec* dec = avcodec_find_decoder(st->codecpar->codec_id);
    if (!dec) return -1;
    codec = avcodec_alloc_context3(dec);
    if (!codec) return -1;
    if (avcodec_parameters_to_context(codec, st->codecpar) < 0) return -1;
    codec->thread_count = 0;  // auto (multi-threaded decode)
    if (avcodec_open2(codec, dec, nullptr) < 0) return -1;
    return 0;
  }

  void close() {
    if (codec) avcodec_free_context(&codec);
    if (fmt) avformat_close_input(&fmt);
    if (avio) {
      av_freep(&avio->buffer);
      avio_context_free(&avio);
    }
  }
};

// Count frames by decoding headers only when metadata lacks nb_frames.
int64_t count_frames(Demux& d) {
  AVStream* st = d.fmt->streams[d.stream_idx];
  if (st->nb_frames > 0) return st->nb_frames;
  // fall back: walk packets (no full decode) — packet count equals frame
  // count for video streams without B-frame reordering ambiguity; to be
  // safe, decode.
  int64_t n = 0;
  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  while (av_read_frame(d.fmt, pkt) >= 0) {
    if (pkt->stream_index == d.stream_idx) {
      if (avcodec_send_packet(d.codec, pkt) == 0) {
        while (avcodec_receive_frame(d.codec, frame) == 0) n++;
      }
    }
    av_packet_unref(pkt);
  }
  avcodec_send_packet(d.codec, nullptr);
  while (avcodec_receive_frame(d.codec, frame) == 0) n++;
  av_frame_free(&frame);
  av_packet_free(&pkt);
  return n;
}

}  // namespace

extern "C" {

int vdec_probe(const char* data, size_t size, double* fps, int* nframes,
               int* width, int* height) {
  Demux d;
  if (d.open(reinterpret_cast<const uint8_t*>(data), size) != 0) {
    d.close();
    return -1;
  }
  AVStream* st = d.fmt->streams[d.stream_idx];
  AVRational r = st->avg_frame_rate.num ? st->avg_frame_rate
                                        : st->r_frame_rate;
  *fps = r.den ? av_q2d(r) : 0.0;
  *width = d.codec->width;
  *height = d.codec->height;
  *nframes = static_cast<int>(count_frames(d));
  d.close();
  return (*nframes > 0 && *fps > 0) ? 0 : -1;
}

int vdec_decode_indices(const char* data, size_t size, const long* indices,
                        int n, unsigned char* out_rgb) {
  if (n <= 0) return -1;
  Demux d;
  if (d.open(reinterpret_cast<const uint8_t*>(data), size) != 0) {
    d.close();
    return -1;
  }
  const int w = d.codec->width, h = d.codec->height;
  const size_t frame_bytes = static_cast<size_t>(w) * h * 3;

  std::set<long> wanted(indices, indices + n);
  const long max_idx = *wanted.rbegin();
  const long min_idx = *wanted.begin();

  // Seek to the keyframe at/before the first wanted frame (the reference's
  // PTS-seek with margin, decoder.py:83-86) so late clips in long videos
  // don't pay a full decode from frame 0. Frame indices are recovered from
  // the first decoded pts after the seek.
  AVStream* st = d.fmt->streams[d.stream_idx];
  bool seeked = false;
  double ticks_per_frame = 0.0;
  if (min_idx > 0 && st->avg_frame_rate.num > 0) {
    ticks_per_frame = (double)st->time_base.den * st->avg_frame_rate.den /
                      ((double)st->time_base.num * st->avg_frame_rate.num);
    int64_t target_pts = (int64_t)(min_idx * ticks_per_frame);
    if (av_seek_frame(d.fmt, d.stream_idx, target_pts,
                      AVSEEK_FLAG_BACKWARD) >= 0) {
      avcodec_flush_buffers(d.codec);
      seeked = true;
    }
  }

  SwsContext* sws = nullptr;
  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  // RGB copies of wanted frames, keyed by frame index
  std::vector<std::pair<long, std::vector<uint8_t>>> decoded;
  AVFrame* last_seen = nullptr;  // refcounted clone, clamp fallback

  long fidx = 0;
  bool fidx_known = !seeked;  // after a seek, derive fidx from the first pts
  bool done = false;
  auto to_rgb = [&](AVFrame* f, uint8_t* dst_buf) {
    if (!sws) {
      sws = sws_getContext(w, h, static_cast<AVPixelFormat>(f->format), w, h,
                           AV_PIX_FMT_RGB24, SWS_BILINEAR, nullptr, nullptr,
                           nullptr);
    }
    uint8_t* dst[1] = {dst_buf};
    int dst_stride[1] = {w * 3};
    sws_scale(sws, f->data, f->linesize, 0, h, dst, dst_stride);
  };
  auto consume = [&](AVFrame* f) {
    if (!fidx_known) {
      int64_t pts = f->best_effort_timestamp != AV_NOPTS_VALUE
                        ? f->best_effort_timestamp
                        : f->pts;
      if (pts != AV_NOPTS_VALUE && ticks_per_frame > 0) {
        fidx = (long)((double)pts / ticks_per_frame + 0.5);
      }
      fidx_known = true;
    }
    if (wanted.count(fidx)) {
      std::vector<uint8_t> rgb(frame_bytes);
      to_rgb(f, rgb.data());
      decoded.emplace_back(fidx, std::move(rgb));
    }
    av_frame_unref(last_seen ? last_seen : (last_seen = av_frame_alloc()));
    av_frame_ref(last_seen, f);  // cheap refcount bump, not a pixel copy
    if (fidx >= max_idx) done = true;
    fidx++;
  };

  while (!done && av_read_frame(d.fmt, pkt) >= 0) {
    if (pkt->stream_index == d.stream_idx) {
      // send/receive with EAGAIN retry so no packet is ever dropped
      int src = avcodec_send_packet(d.codec, pkt);
      while (true) {
        int rrc = avcodec_receive_frame(d.codec, frame);
        if (rrc == 0) { consume(frame); continue; }
        if (rrc == AVERROR(EAGAIN) && src == AVERROR(EAGAIN)) {
          src = avcodec_send_packet(d.codec, pkt);
          continue;
        }
        break;
      }
    }
    av_packet_unref(pkt);
  }
  if (!done) {  // drain decoder delay (last frames live in the pipeline)
    avcodec_send_packet(d.codec, nullptr);
    while (!done && avcodec_receive_frame(d.codec, frame) == 0)
      consume(frame);
  }

  // clamp fallback: requests past EOF map to the final decoded frame
  // (the sampling math already clamps; this is belt-and-braces)
  std::vector<uint8_t> last_rgb;
  if (decoded.size() < wanted.size() && last_seen) {
    last_rgb.resize(frame_bytes);
    to_rgb(last_seen, last_rgb.data());
  }

  int rc = 0;
  for (int i = 0; i < n; i++) {
    const uint8_t* src = nullptr;
    long want = indices[i];
    for (auto& kv : decoded) {
      if (kv.first == want) { src = kv.second.data(); break; }
    }
    if (!src && !last_rgb.empty()) src = last_rgb.data();
    if (!src) { rc = -1; break; }
    memcpy(out_rgb + static_cast<size_t>(i) * frame_bytes, src, frame_bytes);
  }

  if (last_seen) av_frame_free(&last_seen);
  if (sws) sws_freeContext(sws);
  av_frame_free(&frame);
  av_packet_free(&pkt);
  d.close();
  return rc;
}

// ---------------------------------------------------------------------------
// test fixture generator: synthetic mp4 with per-frame grey markers
// ---------------------------------------------------------------------------

int venc_make_test_video(const char* path, int w, int h, int n_frames,
                         double fps) {
  AVFormatContext* fmt = nullptr;
  avformat_alloc_output_context2(&fmt, nullptr, nullptr, path);
  if (!fmt) return -1;
  const AVCodec* enc = avcodec_find_encoder(AV_CODEC_ID_MPEG4);
  if (!enc) { avformat_free_context(fmt); return -1; }
  AVStream* st = avformat_new_stream(fmt, nullptr);
  AVCodecContext* c = avcodec_alloc_context3(enc);
  c->width = w;
  c->height = h;
  c->pix_fmt = AV_PIX_FMT_YUV420P;
  c->time_base = av_d2q(1.0 / fps, 100000);
  c->gop_size = 6;
  c->bit_rate = 2000000;
  if (fmt->oformat->flags & AVFMT_GLOBALHEADER)
    c->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  if (avcodec_open2(c, enc, nullptr) < 0) return -1;
  avcodec_parameters_from_context(st->codecpar, c);
  st->time_base = c->time_base;
  if (avio_open(&fmt->pb, path, AVIO_FLAG_WRITE) < 0) return -1;
  if (avformat_write_header(fmt, nullptr) < 0) return -1;

  AVFrame* frame = av_frame_alloc();
  frame->format = c->pix_fmt;
  frame->width = w;
  frame->height = h;
  av_frame_get_buffer(frame, 0);
  AVPacket* pkt = av_packet_alloc();

  auto flush = [&](AVFrame* f) {
    if (avcodec_send_frame(c, f) < 0) return;
    while (avcodec_receive_packet(c, pkt) == 0) {
      av_packet_rescale_ts(pkt, c->time_base, st->time_base);
      pkt->stream_index = st->index;
      // explicit per-sample duration: without it the mp4 muxer's stts
      // table omits the final sample and demuxers drop the last frame
      pkt->duration = av_rescale_q(1, c->time_base, st->time_base);
      av_interleaved_write_frame(fmt, pkt);
      av_packet_unref(pkt);
    }
  };

  for (int t = 0; t < n_frames; t++) {
    av_frame_make_writable(frame);
    // luma = per-frame marker (monotone ramp readable back through decode)
    uint8_t luma = static_cast<uint8_t>(16 + (t * 220) / std::max(n_frames - 1, 1));
    memset(frame->data[0], luma, static_cast<size_t>(frame->linesize[0]) * h);
    memset(frame->data[1], 128, static_cast<size_t>(frame->linesize[1]) * h / 2);
    memset(frame->data[2], 128, static_cast<size_t>(frame->linesize[2]) * h / 2);
    frame->pts = t;
    flush(frame);
  }
  flush(nullptr);  // drain encoder

  av_write_trailer(fmt);
  avio_closep(&fmt->pb);
  av_packet_free(&pkt);
  av_frame_free(&frame);
  avcodec_free_context(&c);
  avformat_free_context(fmt);
  return 0;
}

}  // extern "C"
