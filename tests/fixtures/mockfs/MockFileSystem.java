import java.io.IOException;
import java.net.URI;
import org.apache.hadoop.fs.FileStatus;
import org.apache.hadoop.fs.Path;
import org.apache.hadoop.fs.RawLocalFileSystem;
import org.apache.hadoop.fs.permission.FsPermission;

/**
 * Test fixture: a local-disk-backed Hadoop FileSystem that reports a
 * NON-file scheme ("mockfs"), so the engine's scheme-qualified URI
 * handling (the surface an s3a:// deployment exercises) can be driven
 * end-to-end in a sandbox with no object store.  Registered via
 * spark.hadoop.fs.mockfs.impl=MockFileSystem.
 *
 * getUri() must be constant (the superclass constructor calls it
 * virtually), and statuses are EAGER copies with a fixed permission:
 * RawLocalFileSystem's DeprecatedRawLocalFileStatus loads permissions
 * lazily through java.nio.Paths.get(status.getPath().toUri()), which
 * rejects any URI whose scheme is not "file".
 */
public class MockFileSystem extends RawLocalFileSystem {
    @Override
    public URI getUri() {
        return URI.create("mockfs:///");
    }

    @Override
    public String getScheme() {
        return "mockfs";
    }

    private FileStatus eager(FileStatus s) {
        return new FileStatus(
            s.getLen(), s.isDirectory(), s.getReplication(), s.getBlockSize(),
            s.getModificationTime(), s.getAccessTime(),
            s.isDirectory() ? FsPermission.getDirDefault() : FsPermission.getFileDefault(),
            "mockfs", "mockfs", s.getPath());
    }

    @Override
    public FileStatus getFileStatus(Path f) throws IOException {
        return eager(super.getFileStatus(f));
    }

    @Override
    public FileStatus[] listStatus(Path f) throws IOException {
        FileStatus[] raw = super.listStatus(f);
        FileStatus[] out = new FileStatus[raw.length];
        for (int i = 0; i < raw.length; i++) {
            out[i] = eager(raw[i]);
        }
        return out;
    }
}
