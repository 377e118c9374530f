// cmw_runtime — native real-time executor for the interactive path.
//
// TPU-native rebuild of the reference's C++ runtime layer (SURVEY.md §2.2):
//   BipedalLocomotion::System::AdvanceableRunner  -> cmw_task (periodic
//       thread, barrier-synchronized start, deadline accounting; reference
//       Main.cpp:75-110,131-134)
//   System::SharedResource<T>                     -> cmw_mailbox (mutexed
//       latest-wins byte mailbox; Main.cpp:70-73,85-87,108-109)
//   System::ClockBuilder / YarpClock              -> cmw_clock (monotonic
//       base with a settable time scale — the YARP_CLOCK=/clock +
//       real_time_factor analog; dockerfiles/centroidal-mpc.yml:45-52)
//   System::handleQuitSignals + main watchdog     -> cmw_request_stop /
//       cmw_any_failed (Main.cpp:112-115,137-145)
//
// The compute itself stays on the device (jitted JAX step functions called
// through the task callbacks); this layer owns threads, timing, and
// exchange — exactly the split the reference uses between BLF System and
// its algorithm classes.
//
// C ABI for ctypes. No exceptions across the boundary.

#include <atomic>
#include <chrono>
#include <condition_variable>
#include <csignal>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

using Clock = std::chrono::steady_clock;
using ns = std::chrono::nanoseconds;

extern "C" {
typedef int (*cmw_task_fn)(void* user, double t_virtual);
}

namespace {

// ---------------------------------------------------------------------------
// virtual clock: scaled monotonic time (real_time_factor semantics)
// ---------------------------------------------------------------------------
struct VClock {
    Clock::time_point epoch = Clock::now();
    std::atomic<double> scale{1.0};
    double now() const {
        auto dt = std::chrono::duration<double>(Clock::now() - epoch).count();
        return dt * scale.load();
    }
};

struct TaskStats {
    std::atomic<uint64_t> runs{0};
    std::atomic<uint64_t> deadline_misses{0};
    std::atomic<uint64_t> total_exec_ns{0};
    std::atomic<uint64_t> max_exec_ns{0};
};

struct Task {
    cmw_task_fn fn = nullptr;
    void* user = nullptr;
    ns period{0};
    TaskStats stats;
    std::thread thread;
    char name[64] = {0};
};

struct Scheduler {
    VClock clock;
    std::vector<Task*> tasks;
    std::atomic<bool> running{false};
    std::atomic<bool> stop_requested{false};
    std::atomic<bool> any_failed{false};
    // start barrier
    std::mutex barrier_mtx;
    std::condition_variable barrier_cv;
    bool started = false;

    ~Scheduler() {
        request_stop();
        join();
        for (auto* t : tasks) delete t;
    }

    void run_task(Task* t) {
        {
            std::unique_lock<std::mutex> lk(barrier_mtx);
            barrier_cv.wait(lk, [&] { return started; });
        }
        auto next = Clock::now();
        while (!stop_requested.load()) {
            next += t->period;
            auto t0 = Clock::now();
            int rc = t->fn ? t->fn(t->user, clock.now()) : 0;
            auto t1 = Clock::now();
            uint64_t exec = (uint64_t)std::chrono::duration_cast<ns>(t1 - t0).count();
            t->stats.runs.fetch_add(1);
            t->stats.total_exec_ns.fetch_add(exec);
            uint64_t prev = t->stats.max_exec_ns.load();
            while (exec > prev && !t->stats.max_exec_ns.compare_exchange_weak(prev, exec)) {}
            if (rc != 0) {  // block failure stops the pipeline (Main.cpp:147-160)
                any_failed.store(true);
                stop_requested.store(true);
                break;
            }
            if (t1 > next) {
                t->stats.deadline_misses.fetch_add(1);
                next = t1;  // resync instead of bursting
            } else {
                std::this_thread::sleep_until(next);
            }
        }
    }

    void start() {
        running.store(true);
        stop_requested.store(false);
        for (auto* t : tasks)
            t->thread = std::thread([this, t] { run_task(t); });
        {
            std::lock_guard<std::mutex> lk(barrier_mtx);
            started = true;  // barrier release: all tasks start together
        }
        barrier_cv.notify_all();
    }

    void request_stop() { stop_requested.store(true); }

    void join() {
        for (auto* t : tasks)
            if (t->thread.joinable()) t->thread.join();
        running.store(false);
    }
};

// ---------------------------------------------------------------------------
// mailbox: latest-wins byte buffer with sequence numbers
// ---------------------------------------------------------------------------
struct Mailbox {
    std::mutex mtx;
    std::vector<uint8_t> buf;
    uint64_t seq = 0;  // 0 = never written
};

std::atomic<Scheduler*> g_signal_target{nullptr};

void signal_handler(int) {
    Scheduler* s = g_signal_target.load();
    if (s) s->request_stop();
}

}  // namespace

extern "C" {

// --- scheduler --------------------------------------------------------------

void* cmw_scheduler_new() { return new Scheduler(); }

void cmw_scheduler_free(void* s) { delete (Scheduler*)s; }

int cmw_add_task(void* sv, const char* name, double period_s, cmw_task_fn fn, void* user) {
    auto* s = (Scheduler*)sv;
    if (s->running.load()) return -1;
    auto* t = new Task();
    std::strncpy(t->name, name ? name : "", sizeof(t->name) - 1);
    t->period = ns((int64_t)(period_s * 1e9));
    t->fn = fn;
    t->user = user;
    s->tasks.push_back(t);
    return (int)s->tasks.size() - 1;
}

void cmw_start(void* sv) { ((Scheduler*)sv)->start(); }

void cmw_request_stop(void* sv) { ((Scheduler*)sv)->request_stop(); }

void cmw_join(void* sv) { ((Scheduler*)sv)->join(); }

int cmw_is_running(void* sv) {
    auto* s = (Scheduler*)sv;
    return (s->running.load() && !s->stop_requested.load()) ? 1 : 0;
}

int cmw_any_failed(void* sv) { return ((Scheduler*)sv)->any_failed.load() ? 1 : 0; }

// install SIGINT/SIGTERM -> stop (handleQuitSignals, Main.cpp:112-115)
void cmw_handle_quit_signals(void* sv) {
    g_signal_target.store((Scheduler*)sv);
    std::signal(SIGINT, signal_handler);
    std::signal(SIGTERM, signal_handler);
}

// --- task stats (the runner's enable_telemetry deadline accounting) ---------

void cmw_task_stats(void* sv, int task, uint64_t* runs, uint64_t* misses,
                    double* mean_exec_ms, double* max_exec_ms) {
    auto* s = (Scheduler*)sv;
    if (task < 0 || task >= (int)s->tasks.size()) return;
    auto& st = s->tasks[task]->stats;
    uint64_t r = st.runs.load();
    *runs = r;
    *misses = st.deadline_misses.load();
    *mean_exec_ms = r ? (st.total_exec_ns.load() / (double)r) / 1e6 : 0.0;
    *max_exec_ms = st.max_exec_ns.load() / 1e6;
}

// --- virtual clock -----------------------------------------------------------

double cmw_clock_now(void* sv) { return ((Scheduler*)sv)->clock.now(); }

void cmw_clock_set_scale(void* sv, double scale) {
    ((Scheduler*)sv)->clock.scale.store(scale);
}

// --- mailbox ------------------------------------------------------------------

void* cmw_mailbox_new() { return new Mailbox(); }

void cmw_mailbox_free(void* m) { delete (Mailbox*)m; }

void cmw_mailbox_write(void* mv, const uint8_t* data, uint64_t len) {
    auto* m = (Mailbox*)mv;
    std::lock_guard<std::mutex> lk(m->mtx);
    m->buf.assign(data, data + len);
    m->seq++;
}

// returns the sequence number (0 if never written); copies min(len, size)
uint64_t cmw_mailbox_read(void* mv, uint8_t* out, uint64_t cap, uint64_t* len) {
    auto* m = (Mailbox*)mv;
    std::lock_guard<std::mutex> lk(m->mtx);
    uint64_t n = m->buf.size() < cap ? m->buf.size() : cap;
    if (n) std::memcpy(out, m->buf.data(), n);
    *len = n;
    return m->seq;
}

}  // extern "C"
